from twopaco_tpu.parallel.sharded import (
    ShardedConfig,
    make_mesh,
    make_sharded_filter,
    sharded_fill_step,
    sharded_mark_step,
)
from twopaco_tpu.parallel.distpipe import build_junctions_dist
