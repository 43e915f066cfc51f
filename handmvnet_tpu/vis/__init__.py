from handmvnet_tpu.vis.visualizer import HandPoseVisualizer, reverse_transform  # noqa: F401
