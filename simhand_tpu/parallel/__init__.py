from simhand_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    replicate_spec,
    batch_spec,
)
from simhand_tpu.parallel.fsdp import (
    FSDP_AXIS,
    create_hybrid_mesh,
    fsdp_sharding,
    make_fsdp_train_step,
)
