from simhand_tpu.data.sources.hand100m import Hand100MSource
from simhand_tpu.data.sources.synthetic import generate_synthetic_hand100m
