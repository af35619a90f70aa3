"""One-off probe: decompose flagship train-step time into components.

Times, on the real chip (one TPU process at a time):
  - full train step (fwd + bwd + optimizer)
  - loss forward only (no grad)
  - depth net forward only
  - pose net forward only
Run: python docs/bench_decompose_probe.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_model, _synthetic_batch
from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
from packnet_sfm_tpu.engine.train import (
    TrainState, make_train_step, replicate_state, zero_metrics)
from packnet_sfm_tpu.models.sfm import init_model, model_loss, model_forward
from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 192, 640
ITERS = 5


def timeit(fn, *args):
    out = fn(*args)  # compile + warm
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts) * 1000


def main():
    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    model = setup_model(cfg.model, dtype=jnp.bfloat16)
    mesh = make_mesh()
    batch = _synthetic_batch(BATCH, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, steps_per_epoch=100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jnp.bfloat16)
    sharded = shard_batch(batch, mesh)

    acc = zero_metrics()
    state, acc = step(state, acc, sharded)  # warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, acc = step(state, acc, sharded)
    _ = float(acc["loss"][0])
    full = (time.perf_counter() - t0) / ITERS * 1000
    print(f"full train step:        {full:7.1f} ms", flush=True)

    # free optimizer state before the non-donated probes (HBM headroom)
    params = jax.device_put(state.params)
    del state, acc

    def cast(b):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, b)

    rng = jax.random.PRNGKey(1)

    @jax.jit
    def depth_only(p, b):
        out, _ = model_forward(model, {"params": p},
                               {"rgb": b["rgb"].astype(jnp.bfloat16)}, train=False)
        return out["inv_depths"][0]

    @jax.jit
    def loss_only(p, b):
        loss, _aux = model_loss(model, {"params": p}, cast(b), rng)
        return loss.astype(jnp.float32)

    @jax.jit
    def grad_only(p, b):
        def f(q):
            loss, _ = model_loss(model, {"params": q}, cast(b), rng)
            return loss.astype(jnp.float32)
        return jax.grad(f)(p)

    for label, fn in [("depth net fwd (1 img)", depth_only),
                      ("loss fwd only", loss_only),
                      ("fwd+bwd (no optimizer)", grad_only)]:
        try:
            print(f"{label:23s} {timeit(fn, params, sharded):7.1f} ms", flush=True)
        except Exception as e:
            print(f"{label:23s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
