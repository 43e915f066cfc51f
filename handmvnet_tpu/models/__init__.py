from handmvnet_tpu.models.handmvnet import HandMvNet  # noqa: F401
