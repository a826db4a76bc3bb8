from simhand_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    replicate_spec,
    batch_spec,
)
