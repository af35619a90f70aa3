"""Data-parallel scaling-efficiency measurement harness.

BASELINE.md requires reporting frames/s/chip at 1 chip, 1 host, and N>=2
hosts with >=85% scaling efficiency. This harness measures the flagship
train step at a fixed per-device batch over growing device counts and
reports throughput + efficiency vs the 1-device run:

    efficiency(n) = imgs_per_sec(n) / (n * imgs_per_sec(1))

On real multi-chip hardware the same code measures ICI/DCN scaling; in CI it
runs on the virtual CPU mesh (validating the harness and the SPMD graphs,
not absolute speed). The reference has no counterpart (it publishes no
throughput at all — SURVEY §6).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import numpy as np


def measure_scaling(
    device_counts: Optional[List[int]] = None,
    per_device_batch: int = 2,
    height: int = 64,
    width: int = 96,
    steps: int = 6,
    warmup: int = 2,
    model=None,
    config=None,
) -> List[Dict]:
    """Measure train-step throughput across device counts.

    Returns [{'devices', 'imgs_per_sec', 'imgs_per_sec_per_device',
    'efficiency'}].
    """
    from __graft_entry__ import _flagship_model, _synthetic_batch
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    if config is None or model is None:
        config, _ = _flagship_model()
        model = setup_model(config.model)

    results = []
    base_rate = None
    for n in device_counts:
        mesh = make_mesh(num_devices=n)
        batch = _synthetic_batch(per_device_batch * n, height, width)
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        tx = make_optimizer(config.model.optimizer, config.model.scheduler, 100)
        state = replicate_state(TrainState.create(variables, tx), mesh)
        step = make_train_step(model, tx, mesh)
        sharded = shard_batch(batch, mesh)
        acc = zero_metrics()
        for _ in range(warmup):
            state, acc = step(state, acc, sharded)
        float(acc["loss"][0])
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(steps):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        dt = time.perf_counter() - t0
        rate = per_device_batch * n * steps / dt
        if base_rate is None:
            base_rate = rate
        results.append({
            "devices": n,
            "imgs_per_sec": rate,
            "imgs_per_sec_per_device": rate / n,
            "efficiency": rate / (base_rate * n),
        })
    return results


def main():
    import json
    for row in measure_scaling():
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}))


if __name__ == "__main__":
    main()
