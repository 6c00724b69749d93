from haplohyped_tpu.parallel.mesh import (
    PARAM_RULES,
    make_mesh,
    param_shardings,
    shard_batch_spec,
)
from haplohyped_tpu.parallel.collectives import (
    sharded_decode_frames,
    all_gather_cohort,
)

__all__ = [
    "PARAM_RULES",
    "make_mesh",
    "param_shardings",
    "shard_batch_spec",
    "sharded_decode_frames",
    "all_gather_cohort",
]
