from packnet_sfm_tpu.egomotion.alignment import refine_pose_photometric
from packnet_sfm_tpu.egomotion.posegraph import (
    PoseGraphConfig,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
)
from packnet_sfm_tpu.egomotion.evaluation import (
    align_umeyama,
    absolute_trajectory_error,
    relative_pose_error,
    load_kitti_odometry_poses,
)
