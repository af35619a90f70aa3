from packnet_sfm_tpu.models.sfm import SfmModelDef, model_forward, model_loss
