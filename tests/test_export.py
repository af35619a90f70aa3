"""AOT export round-trip: serialize the depth forward, reload, compare.

TPU-native counterpart of the reference's TensorRT deployment path
(reference README.md:17): jax.export bakes params into StableHLO; the
deserialized artifact must reproduce the live model's output without
importing any model code.
"""

import jax
import jax.export
import jax.numpy as jnp
import numpy as np

from packnet_sfm_tpu.cli.export import export_depth_model
from packnet_sfm_tpu.engine.factory import setup_model
from packnet_sfm_tpu.core.config import get_default_config
from packnet_sfm_tpu.models.sfm import model_forward


def test_export_roundtrip(tmp_path):
    cfg = get_default_config()
    cfg.model.name = "SfmModel"
    cfg.model.depth_net.name = "PackNetSlim01"
    cfg.model.depth_net.version = "1A"
    model = setup_model(cfg.model)

    rgb = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3).astype(np.float32))
    variables = jax.jit(lambda r: model.depth_net.init(
        jax.random.PRNGKey(0), r, train=False))(rgb)
    variables = {"params": {"depth_net": variables["params"]}}

    path = str(tmp_path / "depth.jaxexp")
    blob = export_depth_model(model, variables, 1, (64, 96), path)
    assert len(blob) > 1000

    # reload purely from bytes and compare with the live forward
    restored = jax.export.deserialize(open(path, "rb").read())
    out_restored = restored.call(rgb)
    out_live, _ = model_forward(model, variables, {"rgb": rgb}, train=False)
    np.testing.assert_allclose(np.asarray(out_restored),
                               np.asarray(out_live["inv_depths"][0]),
                               rtol=1e-5, atol=1e-6)
