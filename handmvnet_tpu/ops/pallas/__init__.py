from handmvnet_tpu.ops.pallas.attention import fused_attention  # noqa: F401
