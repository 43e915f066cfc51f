"""handmvnet_tpu: a TPU-native (JAX/XLA/Pallas) multi-view 3D hand pose framework.

Re-designed from scratch with the capability surface of pyxploiter/HandMvNet
(reference mounted at /root/reference): per-view CNN backbones, 2D heatmap head
with soft-argmax, per-joint feature sampling, cross-view attention fusion,
Chebyshev graph-conv 3D joint decoding, MANO inverse kinematics and mesh
recovery, plus data pipelines, losses/metrics, training/eval/benchmark drivers.

Everything on the compute path is functional JAX, jit-compiled for TPU:
NHWC convolutions on the MXU, fused attention over the tiny 21*V token
sequence, constant-folded graph Laplacians, and a device-side MANO/IK stage
(the reference runs IK per-sample on CPU inside its timed loop,
reference: src/eval_fps.py:84-94).
"""

__version__ = "0.1.0"

# Convenience surface: `from handmvnet_tpu import Config, HandMvNet, ...`
from handmvnet_tpu.config import (  # noqa: E402, F401
    Config,
    DataConfig,
    LossWeights,
    ModelConfig,
    TrainConfig,
)


def __getattr__(name):  # lazy heavy imports (jax/flax) on first access
    if name == "HandMvNet":
        from handmvnet_tpu.models import HandMvNet

        return HandMvNet
    if name == "ManoLayer":
        from handmvnet_tpu.models.mano import ManoLayer

        return ManoLayer
    if name == "HandPoseVisualizer":
        from handmvnet_tpu.vis import HandPoseVisualizer

        return HandPoseVisualizer
    raise AttributeError(name)
