"""Deployment / serving surface.

The reference deploys by loading a ``.pth`` into a torch module per
process (hubconf.py, minimal-hand/demo.py). The TPU-native equivalent is
an ahead-of-time compiled artifact: ``export.py`` serializes the frozen
forward pass (params baked in as constants) to a single StableHLO file
that any JAX process — CPU or TPU, no model code, no checkpoint — can
load and call. Batch-polymorphic exports serve any batch size from one
artifact.
"""
from simhand_tpu.serving.export import (  # noqa: F401
    build_detnet_forward,
    build_encoder_forward,
    detnet_apply,
    encoder_apply,
    export_apply_quantized,
    export_forward,
    load_artifact,
    save_artifact,
    shard_over_devices,
)
