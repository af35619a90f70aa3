"""Network tests: output shapes + exact-weight transfer parity vs reference."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.nn import (
    DepthResNet,
    PackNet01,
    PackNetSlim01,
    PoseNet,
    PoseResNet,
)


def _init(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return variables


class TestShapes:
    def test_packnet01_shapes(self):
        net = PackNet01(version="A")
        x = jnp.zeros((1, 64, 96, 3))
        variables = _init(net, x, train=True)
        disps = net.apply(variables, x, train=True)
        assert len(disps) == 4
        for i, d in enumerate(disps):
            assert d.shape == (1, 64 >> i, 96 >> i, 1)
            assert float(d.min()) >= 0 and float(d.max()) <= 2.0  # sigmoid/0.5

    def test_packnet01_version_b(self):
        net = PackNet01(version="B")
        x = jnp.zeros((1, 32, 32, 3))
        variables = _init(net, x, train=True)
        disps = net.apply(variables, x, train=True)
        assert disps[0].shape == (1, 32, 32, 1)

    def test_packnet_slim_shapes(self):
        net = PackNetSlim01(version="A")
        x = jnp.zeros((2, 32, 64, 3))
        variables = _init(net, x, train=True)
        disps = net.apply(variables, x, train=True)
        assert disps[0].shape == (2, 32, 64, 1)

    def test_depth_resnet_shapes(self):
        net = DepthResNet(version="18")
        x = jnp.zeros((1, 64, 96, 3))
        variables = _init(net, x, train=False)
        disps = net.apply(variables, x, train=False)
        assert len(disps) == 4
        assert disps[0].shape == (1, 64, 96, 1)
        assert disps[3].shape == (1, 8, 12, 1)
        # disp_to_depth range: scaled disp in [1/100, 1/0.1]
        assert float(disps[0].min()) >= 0.01 - 1e-6

    def test_posenet_shapes(self):
        net = PoseNet()
        x = jnp.zeros((2, 64, 96, 3))
        ctx = [x, x]
        variables = _init(net, x, ctx)
        pose = net.apply(variables, x, ctx)
        assert pose.shape == (2, 2, 6)

    def test_pose_resnet_shapes(self):
        net = PoseResNet(version="18")
        x = jnp.zeros((1, 64, 96, 3))
        ctx = [x, x]
        variables = _init(net, x, ctx, train=False)
        pose = net.apply(variables, x, ctx, train=False)
        assert pose.shape == (1, 2, 6)


class TestTorchWeightParity:
    """Instantiate the reference nets with random torch weights, import them,
    and require near-bitwise identical outputs — validates both the topology
    and utils/torch_import end to end."""

    def _ref_import(self, modname):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        try:
            mod = __import__(modname, fromlist=["*"])
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference not importable: {e}")
        finally:
            sys.path.remove("/root/reference")
        return torch, mod

    @pytest.mark.parametrize("version", ["A", "B"])
    def test_packnet01_forward_parity(self, version):
        torch, mod = self._ref_import("packnet_sfm.networks.depth.PackNet01")
        from packnet_sfm_tpu.utils.torch_import import (
            packnet_from_torch, state_dict_to_numpy)

        ref = mod.PackNet01(version="1" + version)
        ref.train()
        sd = state_dict_to_numpy(ref.state_dict())
        params = packnet_from_torch(sd)

        rng = np.random.default_rng(0)
        x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))["inv_depths"]
        net = PackNet01(version=version)
        ours = net.apply({"params": params}, jnp.asarray(x), train=True)
        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(
                np.asarray(o), t.numpy().transpose(0, 2, 3, 1), atol=5e-5)

    def test_posenet_forward_parity(self):
        torch, mod = self._ref_import("packnet_sfm.networks.pose.PoseNet")
        from packnet_sfm_tpu.utils.torch_import import (
            posenet_from_torch, state_dict_to_numpy)

        ref = mod.PoseNet(nb_ref_imgs=2)
        ref.eval()
        sd = state_dict_to_numpy(ref.state_dict())
        params = posenet_from_torch(sd)

        rng = np.random.default_rng(1)
        x = rng.uniform(size=(2, 64, 96, 3)).astype(np.float32)
        c1 = rng.uniform(size=(2, 64, 96, 3)).astype(np.float32)
        c2 = rng.uniform(size=(2, 64, 96, 3)).astype(np.float32)
        t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
        with torch.no_grad():
            theirs = ref(t(x), [t(c1), t(c2)]).numpy()
        net = PoseNet()
        ours = net.apply({"params": params}, jnp.asarray(x),
                         [jnp.asarray(c1), jnp.asarray(c2)])
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)
