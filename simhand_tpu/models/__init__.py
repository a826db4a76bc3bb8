from simhand_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from simhand_tpu.models.projection import ProjectionHead
from simhand_tpu.models.contrastive import ContrastiveModel, EXPERIMENT_TYPES
from simhand_tpu.models.equivariance import (
    rotate_encodings,
    translate_encodings,
    inverse_transform_projections,
)
