from ar_slam_tpu.parallel.mesh import block_mesh, shard_blocks  # noqa: F401
from ar_slam_tpu.parallel.dist_lm import (  # noqa: F401
    TagShardedProblem,
    lm_solve_dist,
    make_dist_wave_solver,
    make_tag_sharded_hooks,
)
from ar_slam_tpu.parallel.partition import (  # noqa: F401
    partition_blocks,
    prepare_tag_shards,
)
