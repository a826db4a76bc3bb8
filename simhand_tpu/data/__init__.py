from simhand_tpu.data.annotations import (
    Hand100MAnnotations,
    load_hand100m,
    write_hand100m,
)
