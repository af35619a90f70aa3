from packnet_sfm_tpu.geometry.pose import (
    euler_to_rotation,
    pose_vec_to_mat,
    invert_pose,
    compose_poses,
    transform_points,
)
from packnet_sfm_tpu.geometry.camera import (
    Camera,
    scale_intrinsics,
    invert_intrinsics,
    reconstruct,
    project,
    view_synthesis,
)
