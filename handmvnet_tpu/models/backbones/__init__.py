from handmvnet_tpu.models.backbones.resnet import ResNetBackbone  # noqa: F401
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone  # noqa: F401
from handmvnet_tpu.models.backbones.hourglass import (  # noqa: F401
    StackedHourglass,
    StackedBisectedHourglass,
)
