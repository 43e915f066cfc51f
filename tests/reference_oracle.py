"""Import helpers for using the *reference implementation itself* as a test
oracle (imported read-only from /root/reference, never copied).

The reference's heavy deps (lightning, webdataset, manopth, torchvision) are
absent; torchvision is only imported for weight-URL enums, so a stub
suffices as long as tests construct models with PRETRAINED=False.
"""

import inspect
import sys
import types

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def np_axangle2mat(axis, angle, is_normalized=False):
    """Plain-numpy Rodrigues, identical math to transforms3d.axangles
    .axangle2mat (used to stub transforms3d for the reference IK import)."""
    axis = np.asarray(axis, dtype=np.float64).reshape(-1)
    if not is_normalized:
        axis = axis / (np.linalg.norm(axis) or 1.0)
    x, y, z = axis
    angle = float(np.asarray(angle).reshape(-1)[0]) if np.asarray(angle).size else 0.0
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    return np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


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


def _stub_lightning():
    """A ~20-line lightning stub: LightningModule = torch.nn.Module plus the
    hooks the reference HandMvNet class actually calls (save_hyperparameters,
    log, device). Makes /root/reference/src/models/handmvnet.py importable so
    the reference's OWN composition glue (forward/_calculate_loss/
    _calculate_mpjpe) can serve as the end-to-end parity oracle."""
    if "lightning" in sys.modules:
        return
    import torch

    L = types.ModuleType("lightning")

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *args, **kwargs):
            frame = inspect.currentframe().f_back
            self._stub_hparams = {
                k: v for k, v in frame.f_locals.items()
                if k not in ("self", "__class__")
            }

        @property
        def hparams(self):
            return self._stub_hparams

        def log(self, name, value, **kwargs):
            if not hasattr(self, "_stub_logged"):
                self._stub_logged = {}
            self._stub_logged[name] = value

        def log_dict(self, d, **kwargs):
            for k, v in d.items():
                self.log(k, v)

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    L.LightningModule = LightningModule
    L.seed_everything = lambda *a, **k: None
    sys.modules["lightning"] = L


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _stub_vis_deps():
    """plotly / manopth / transforms3d are absent in this container; the
    reference only touches them inside functions we never call (visualizer
    mesh rendering, JointsToVertices with get_vertices=True), so import-time
    stubs suffice — except transforms3d, which gets real Rodrigues math so
    the reference analytical IK stays usable as an oracle."""
    plotly = _stub_module("plotly")
    plotly.graph_objs = _stub_module("plotly.graph_objs")

    class _ManoLayerUnavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("manopth is not available in this container")

    manopth = _stub_module("manopth")
    manopth.manolayer = _stub_module(
        "manopth.manolayer", ManoLayer=_ManoLayerUnavailable
    )

    t3d = _stub_module("transforms3d")
    t3d.axangles = _stub_module("transforms3d.axangles", axangle2mat=np_axangle2mat)


def import_reference_handmvnet():
    """Import the reference's ACTUAL HandMvNet Lightning class (read-only
    oracle; heavy deps stubbed). Closes the transcription risk of hand-wired
    torch models: forward (handmvnet.py:158-266), _calculate_loss (:279-351)
    and _calculate_mpjpe (:353-423) run the reference's own code."""
    _stub_torchvision()
    _stub_lightning()
    _stub_vis_deps()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import models.handmvnet as ref_handmvnet

    return ref_handmvnet.HandMvNet


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
