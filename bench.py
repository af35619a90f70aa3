"""Benchmark: PackNet01 self-sup training throughput on the real chip.

Proxy for the reference's train_kitti.yaml hot loop (PackNet01 1A + PoseNet,
192x640 — BASELINE.md throughput proxy). The reference publishes no speed
numbers (BASELINE.md), so vs_baseline is the ratio against a fixed nominal
10 imgs/s/GPU working figure for the reference's documented hardware class.

Robustness: the pooled/tunneled chip shows contention and occasional remote-
compile failures, so the run retries once on infrastructure errors and
reports the median of 3 timing windows. Batch defaults to 16/chip — the
round-3 throughput peak (b8 34.8 / b16 39.6 / b24 36.1 / b32 35.7
imgs/s/chip, no remat; PN_BENCH_BATCH overrides).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compile cache: full-train-step remote compiles take minutes on
# the tunneled chip; a warm cache makes repeat bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PN_COMPILE_CACHE", "/root/.cache/jax_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from __graft_entry__ import _flagship_model, _synthetic_batch

NOMINAL_REFERENCE_IMGS_PER_SEC = 10.0
BATCH = int(os.environ.get("PN_BENCH_BATCH", "16"))
H, W = 192, 640
WARMUP, ITERS, WINDOWS = 2, 5, 3


def run_once() -> float:
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    # Remat trades ~13% step time for ~2x activation HBM (b16: 39.6 -> 34.5
    # imgs/s). Since the round-3 fold/unpack rewrites, batch 16 fits WITHOUT
    # remat; keep it for HR or batch 32+.
    if os.environ.get("PN_BENCH_REMAT", "0") == "1":
        cfg.model.depth_net.remat = True
    model = setup_model(cfg.model, dtype=jax.numpy.bfloat16)
    mesh = make_mesh()
    n_chips = mesh.devices.size

    batch = _synthetic_batch(BATCH * n_chips, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, steps_per_epoch=100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jax.numpy.bfloat16)
    sharded = shard_batch(batch, mesh)

    # NOTE: sync via host fetch of the metrics — on the axon-tunneled platform
    # block_until_ready does not actually wait for execution.
    acc = zero_metrics()
    for _ in range(WARMUP):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))

    rates = []
    for _ in range(WINDOWS):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))  # forces completion
        dt = time.perf_counter() - t0
        rates.append(BATCH * n_chips * ITERS / dt / n_chips)
    return float(np.median(rates))


def run_hr_once() -> float:
    """HR 384x1280 row (reference README.md:191 velsup-HR proxy): extended
    remat (round 5) fits batch 4 directly — 5.74 imgs/s/chip vs 5.14 for
    2x b2 grad-accum microbatches, so accum defaults to 1. Set
    PN_BENCH_HR_ACCUM=2 to exercise the microbatch path."""
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

    hr_batch = int(os.environ.get("PN_BENCH_HR_BATCH", "4"))
    accum = int(os.environ.get("PN_BENCH_HR_ACCUM", "1"))
    h, w = 384, 1280
    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    cfg.model.depth_net.remat = True
    model = setup_model(cfg.model, dtype=jax.numpy.bfloat16)
    mesh = make_mesh()
    n_chips = mesh.devices.size
    batch = _synthetic_batch(hr_batch * n_chips, h, w)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jax.numpy.bfloat16,
                           grad_accum=accum)
    sharded = shard_batch(batch, mesh)
    acc = zero_metrics()
    for _ in range(WARMUP):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))
    rates = []
    for _ in range(WINDOWS):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        dt = time.perf_counter() - t0
        rates.append(hr_batch * ITERS / dt)
    return float(np.median(rates))


def main():
    last_err = None
    for _attempt in range(2):
        try:
            imgs_per_sec_per_chip = run_once()
            break
        except Exception as e:  # pragma: no cover — infra flake retry
            last_err = e
            time.sleep(10)
    else:
        raise last_err

    print(json.dumps({
        "metric": "packnet01_selfsup_192x640_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "imgs/s/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / NOMINAL_REFERENCE_IMGS_PER_SEC, 3),
    }))

    if os.environ.get("PN_BENCH_HR", "0") == "1":
        # Second row, env-gated so the driver's single-line contract holds.
        # Recorded artifact: HR_BENCH_r05.json + docs/STATUS.md.
        hr = run_hr_once()
        print(json.dumps({
            "metric": "packnet01_selfsup_384x1280_train_imgs_per_sec_per_chip",
            "value": round(hr, 3),
            "unit": "imgs/s/chip",
            "vs_baseline": round(hr / NOMINAL_REFERENCE_IMGS_PER_SEC, 3),
        }))


if __name__ == "__main__":
    main()
