"""Config system tests: defaults, merging, and reference-yaml compatibility."""

import numpy as np
import pytest

from packnet_sfm_tpu.core.config import (
    get_default_config,
    load_config,
    merge_config,
    parse_train_config,
)


class TestConfig:
    def test_defaults_complete(self):
        c = get_default_config()
        assert c.model.optimizer.depth.lr == 0.0002
        assert c.model.loss.ssim_loss_weight == 0.85
        assert c.datasets.train.batch_size == 8
        assert c.checkpoint.save_top_k == 5

    def test_merge_nested(self):
        c = get_default_config()
        m = merge_config(c, {"model": {"optimizer": {"depth": {"lr": 0.1}}}})
        assert m.model.optimizer.depth.lr == 0.1
        assert m.model.optimizer.pose.lr == 0.0002  # untouched
        assert c.model.optimizer.depth.lr == 0.0002  # original unchanged

    def test_load_our_configs(self):
        import glob
        import os
        names = [os.path.splitext(os.path.basename(p))[0]
                 for p in glob.glob("configs/*.yaml")]
        assert len(names) >= 11
        for name in names:
            cfg = parse_train_config(f"configs/{name}.yaml")
            assert cfg.prepared
            assert cfg.model.name

    def test_reference_yaml_compatibility(self):
        """The reference repo's yaml configs must load unmodified."""
        import glob
        import os
        ref_configs = sorted(glob.glob("/root/reference/configs/*.yaml"))
        assert len(ref_configs) >= 10
        for path in ref_configs:
            cfg = parse_train_config(path)
            assert cfg.model.get("name") is not None, path
            # tuple-typed image_shape parses from "(H, W)" strings
            shape = cfg.datasets.augmentation.image_shape
            assert isinstance(shape, tuple), (path, shape)

    def test_dataset_list_broadcast(self):
        c = get_default_config()
        c.datasets.validation.dataset = ["KITTI", "KITTI"]
        c.datasets.validation.path = ["/a"]
        c.datasets.validation.split = ["x.txt", "y.txt"]
        c.datasets.validation.depth_type = ["velodyne"]
        cfg = parse_train_config(c)
        assert cfg.datasets.validation.path == ["/a", "/a"]
        assert cfg.datasets.validation.depth_type == ["velodyne", "velodyne"]

    def test_factory_builds_all_reference_models(self):
        """Every reference train config must produce a working model def."""
        from packnet_sfm_tpu.engine.factory import setup_model
        import glob
        for path in sorted(glob.glob("/root/reference/configs/train_*.yaml")):
            cfg = parse_train_config(path)
            model = setup_model(cfg.model)
            assert model.depth_net is not None, path
