from .projection import (
    homogenize_points,
    homogenize_vectors,
    transform_cam2world,
    transform_world2cam,
    project,
    project_camera_space,
    unproject,
    get_world_rays,
    sample_image_grid,
    get_fov,
    unnormalize_intrinsics,
)
from .gaussians import quaternion_to_matrix, build_covariance
from .sh import rotate_sh, eval_sh, num_sh_coeffs
from .epipolar import epipolar_sample_grid, relative_pose

__all__ = [
    "homogenize_points",
    "homogenize_vectors",
    "transform_cam2world",
    "transform_world2cam",
    "project",
    "project_camera_space",
    "unproject",
    "get_world_rays",
    "sample_image_grid",
    "get_fov",
    "unnormalize_intrinsics",
    "quaternion_to_matrix",
    "build_covariance",
    "rotate_sh",
    "eval_sh",
    "num_sh_coeffs",
    "epipolar_sample_grid",
    "relative_pose",
]
