from dmvsnet_tpu.parallel.mesh import (  # noqa: F401
    AXIS_DATA,
    AXIS_SPATIAL,
    batch_spec,
    make_mesh,
    shard_batch,
)
