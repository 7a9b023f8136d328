from ar_slam_tpu.parallel.mesh import block_mesh, shard_blocks  # noqa: F401
from ar_slam_tpu.parallel.dist_lm import (  # noqa: F401
    lm_solve_dist,
    make_dist_block_hooks,
    make_dist_wave_solver,
)
from ar_slam_tpu.parallel.partition import partition_blocks  # noqa: F401
