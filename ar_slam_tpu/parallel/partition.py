"""Observation-graph partitioner for the distributed solver.

Assigns blocks (observations) to mesh shards.  Since the reduced system is
psum'd either way, partitioning affects only load balance and the locality
of the per-device segment-sums; correctness is partition-invariant (tested).

Strategy: order blocks by (capture, tag) and deal them into contiguous
equal-size shards — captures' observations stay mostly on one device, which
keeps per-device gather locality high.  ``by="tag"`` orders by tag instead
(better when tags >> captures).
"""

from __future__ import annotations

import numpy as np


def partition_blocks(cap_idx: np.ndarray, tag_idx: np.ndarray,
                     block_mask: np.ndarray, n_parts: int,
                     by: str = "capture") -> np.ndarray:
    """Return a permutation of block rows placing active blocks in
    locality-preserving contiguous shards (padding rows go last).

    Apply the permutation to every block-axis array before sharding.
    """
    b = cap_idx.shape[0]
    active = np.nonzero(block_mask)[0]
    inactive = np.nonzero(~block_mask)[0]
    if by == "capture":
        key = (cap_idx[active].astype(np.int64) << 32) | tag_idx[active]
    else:
        key = (tag_idx[active].astype(np.int64) << 32) | cap_idx[active]
    order = active[np.argsort(key, kind="stable")]
    perm = np.concatenate([order, inactive])
    assert perm.shape[0] == b
    return perm
