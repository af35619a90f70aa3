"""HR 2D-mesh validation: one train step of the flagship model at 384x1280
on an 8-device virtual CPU mesh laid out (data=4, space=2).

Validates that the (data x space) spatial sharding compiles and executes at
the REAL HR shape (the claimed use case for the 2D mesh: per-chip activation
memory, not batch, is the limit at 384x1280) — the suite only exercises it
at 32x64 toy shape. Records compile + step wall time.

Run (CPU, no TPU needed):

    python docs/bench_hr_2dmesh.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PN_COMPILE_CACHE", "/root/.cache/jax_graft"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from __graft_entry__ import _flagship_model, _synthetic_batch


def main():
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh_2d, shard_batch

    cfg, _ = _flagship_model()
    cfg.model.depth_net.remat = True
    model = setup_model(cfg.model)
    mesh = make_mesh_2d(spatial_shards=2, num_devices=8)

    batch = _synthetic_batch(4, 384, 1280)
    t0 = time.time()
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=10)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh)
    sharded = shard_batch(batch, mesh)
    spec = tuple(sharded["rgb"].sharding.spec)
    assert spec[:2] == ("data", "space"), spec
    t1 = time.time()
    state, acc = step(state, zero_metrics(), sharded)
    loss = float(acc["loss"][0])
    t2 = time.time()
    assert np.isfinite(loss), loss
    print(f"HR 2D mesh (data=4, space=2) @ 384x1280 b4: loss={loss:.4f} "
          f"init={t1 - t0:.0f}s compile+step1={t2 - t1:.0f}s")
    t3 = time.time()
    state, acc = step(state, acc, sharded)
    float(acc["loss"][0])
    print(f"steady step: {time.time() - t3:.1f}s (8 virtual CPU devices)")


if __name__ == "__main__":
    main()
