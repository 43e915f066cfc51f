"""Core jittable ops: the kernel library underneath the models.

Everything here is shape-static, functional, and differentiable where it
needs to be; the hot paths (soft-argmax, point sampling, attention) have
Pallas TPU implementations under ops/pallas with jnp reference versions here.
"""

from handmvnet_tpu.ops.heatmap import (  # noqa: F401
    soft_argmax_2d,
    soft_argmax_3d,
    hard_argmax_2d,
    render_gaussian_heatmaps,
)
from handmvnet_tpu.ops.sampling import sample_points_bilinear  # noqa: F401
from handmvnet_tpu.ops.geometry import (  # noqa: F401
    joints_img_to_crop,
    joints_crop_to_img,
    center_scale_to_box,
    clamp_box,
    points_to_square_box,
    centered_coordinates,
    fov_angles,
)
from handmvnet_tpu.ops.camera import (  # noqa: F401
    project_points,
    unproject_points,
    transform_between_cameras,
    reproject_to_views,
    intrinsics_vec_to_matrix,
)
from handmvnet_tpu.ops.procrustes import (  # noqa: F401
    similarity_align,
    rigid_align_3pt,
)
from handmvnet_tpu.ops.graph import (  # noqa: F401
    normalized_adjacency,
    cheb_basis,
)
from handmvnet_tpu.ops.resize import resize_bilinear_antialias, crop_resize_normalize  # noqa: F401
from handmvnet_tpu.ops.svd3 import svd3x3, symeig3x3  # noqa: F401
from handmvnet_tpu.ops.triangulation import (  # noqa: F401
    batch_triangulate_dlt,
    batch_triangulate_dlt_ransac,
    triangulate_dlt_confident,
)
