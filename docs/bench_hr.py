"""HR benchmark: PackNet01 self-sup at 384x1280 (velsup-HR proxy,
reference README.md:191 row) on the real chip.

Mirrors bench.py but at HR shape with remat on (activation HBM at 384x1280
exceeds the chip without it). Batch from PN_HR_BATCH (default 2).

    python docs/bench_hr.py
Prints one JSON line {metric, value, unit}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PN_COMPILE_CACHE", "/root/.cache/jax_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from __graft_entry__ import _flagship_model, _synthetic_batch

BATCH = int(os.environ.get("PN_HR_BATCH", "2"))
H, W = 384, 1280
WARMUP, ITERS, WINDOWS = 2, 4, 3


def main():
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    cfg.model.depth_net.remat = os.environ.get("PN_HR_REMAT", "1") == "1"
    model = setup_model(cfg.model, dtype=jax.numpy.bfloat16)
    mesh = make_mesh()
    n_chips = mesh.devices.size

    batch = _synthetic_batch(BATCH * n_chips, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jax.numpy.bfloat16)
    sharded = shard_batch(batch, mesh)

    acc = zero_metrics()
    for _ in range(WARMUP):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))  # host fetch = sync

    rates = []
    for _ in range(WINDOWS):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        dt = time.perf_counter() - t0
        rates.append(BATCH * n_chips * ITERS / dt / n_chips)

    print(json.dumps({
        "metric": "packnet01_selfsup_384x1280_train_imgs_per_sec_per_chip",
        "value": round(float(np.median(rates)), 3),
        "unit": "imgs/s/chip",
        "batch_per_chip": BATCH,
        "remat": cfg.model.depth_net.remat,
    }))


if __name__ == "__main__":
    main()
