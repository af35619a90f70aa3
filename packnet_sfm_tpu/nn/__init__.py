from packnet_sfm_tpu.nn.layers import Conv2dBlock, ResidualBlock, InvDepthHead
from packnet_sfm_tpu.nn.packnet import PackNet01, PackNetSlim01
from packnet_sfm_tpu.nn.depth_resnet import DepthResNet
from packnet_sfm_tpu.nn.posenet import PoseNet
from packnet_sfm_tpu.nn.pose_resnet import PoseResNet
