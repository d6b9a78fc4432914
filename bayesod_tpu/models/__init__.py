from bayesod_tpu.models.resnet import ResNet
from bayesod_tpu.models.fpn import FPN
from bayesod_tpu.models.heads import RetinaNetHeads
from bayesod_tpu.models.retinanet import (
    RetinaNet,
    init_variables,
    mc_forward,
    single_forward,
)

__all__ = [
    "ResNet",
    "FPN",
    "RetinaNetHeads",
    "RetinaNet",
    "init_variables",
    "mc_forward",
    "single_forward",
]
