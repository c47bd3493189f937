"""Mesh construction and the sharded SPMD training program."""

from muax_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    data_sharding,
    replicated,
)
from muax_tpu.parallel.model_parallel import (
    make_model_parallel_apply,
    shard_az_params,
    sharded_fraction,
)
from muax_tpu.parallel.sharded import ShardedProgram, make_sharded_program
