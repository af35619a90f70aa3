from packnet_sfm_tpu.ops.image import (
    image_grid,
    flip_lr,
    gradient_x,
    gradient_y,
    interpolate_image,
    match_scales,
)
from packnet_sfm_tpu.ops.warp import grid_sample
from packnet_sfm_tpu.ops.ssim import ssim
from packnet_sfm_tpu.ops.packing import space_to_depth, depth_to_space
