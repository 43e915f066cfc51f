"""Import helpers for using the *reference implementation itself* as a test
oracle (imported read-only from /root/reference, never copied).

The reference's heavy deps (lightning, webdataset, manopth, torchvision) are
absent; torchvision is only imported for weight-URL enums, so a stub
suffices as long as tests construct models with PRETRAINED=False.
"""

import sys
import types

REFERENCE_SRC = "/root/reference/src"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")

    class _Weights:
        class DEFAULT:
            url = "stub://unused"

    tv_resnet.ResNet18_Weights = _Weights
    tv_resnet.ResNet34_Weights = _Weights
    tv_resnet.ResNet50_Weights = _Weights
    tv.models = tv_models
    tv_models.resnet = tv_resnet
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet


def import_reference_modules():
    """Returns a namespace of reference torch modules for oracle use."""
    _stub_torchvision()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import models.backbones.resnet as ref_resnet
    import models.backbones.hrnet as ref_hrnet
    import models.backbones.hourglass as ref_hourglass
    import models.fusion as ref_fusion
    import models.layers as ref_layers
    import models.nets as ref_nets
    import models.utils as ref_model_utils

    ns = types.SimpleNamespace(
        resnet=ref_resnet,
        hrnet=ref_hrnet,
        hourglass=ref_hourglass,
        fusion=ref_fusion,
        layers=ref_layers,
        nets=ref_nets,
        model_utils=ref_model_utils,
    )
    return ns
