"""One-off probe: train-step throughput with pack/unpack remat on vs off.

After the fold-conv fusion the pack layers no longer materialize d*Cp
activations, so remat's HBM savings shrank; this measures whether the ~15%
recompute still buys anything. Run manually (one TPU process at a time):

    python docs/bench_remat_probe.py [batch]
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
from packnet_sfm_tpu.models.sfm import init_model
from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
H, W = 192, 640


def run(remat: bool) -> float:
    import dataclasses
    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    model = setup_model(cfg.model, dtype=jnp.bfloat16)
    model = dataclasses.replace(
        model, depth_net=model.depth_net.clone(remat=remat))
    mesh = make_mesh()
    batch = _synthetic_batch(BATCH, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, steps_per_epoch=100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jnp.bfloat16)
    sharded = shard_batch(batch, mesh)
    acc = zero_metrics()
    for _ in range(3):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))
    rates = []
    for _ in range(3):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(5):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        rates.append(BATCH * 5 / (time.perf_counter() - t0))
    return float(np.median(rates))


if __name__ == "__main__":
    for remat in (True, False):
        try:
            r = run(remat)
            print(f"remat={remat} batch={BATCH}: {r:.2f} imgs/s ({1000*BATCH/r:.0f} ms/step)")
        except Exception as e:
            print(f"remat={remat} batch={BATCH}: FAILED {type(e).__name__}: {str(e)[:200]}")
