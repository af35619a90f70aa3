from packnet_sfm_tpu.losses.photometric import (
    MultiViewPhotometricConfig,
    multiview_photometric_loss,
)
from packnet_sfm_tpu.losses.smoothness import calc_smoothness, smoothness_loss
from packnet_sfm_tpu.losses.supervised import SupervisedLossConfig, supervised_loss
from packnet_sfm_tpu.losses.velocity import velocity_loss
from packnet_sfm_tpu.losses.progressive import progressive_num_scales
