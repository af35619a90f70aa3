"""One-off probe: roofline position of the flagship train step.

Compiles the train step AOT for the current backend, reads XLA's
cost_analysis (flops / bytes accessed), and reports achieved TFLOP/s and
HBM GB/s against v5e peaks (197 bf16 TFLOP/s, 819 GB/s) from a timed run.
Tells us whether the step is compute-, bandwidth-, or overhead-bound and
what the speed-of-light imgs/s would be.

Run manually (one TPU process at a time):
    python docs/bench_cost_probe.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 192, 640
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def main():
    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    model = setup_model(cfg.model, dtype=jnp.bfloat16)
    mesh = make_mesh()
    batch = _synthetic_batch(BATCH, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh, compute_dtype=jnp.bfloat16)
    sharded = shard_batch(batch, mesh)

    acc = zero_metrics()
    for _ in range(3):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))

    ts = []
    for _ in range(3):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(5):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        ts.append((time.perf_counter() - t0) / 5)
    dt = min(ts)

    # Pull cost analysis via AOT lowering of the same jitted step (the
    # persistent compile cache makes the recompile cheap). make_train_step
    # returns a thin `call` wrapper; its closure holds the jax.jit object.
    cells = {v: c.cell_contents for v, c in
             zip(step.__code__.co_freevars, step.__closure__)}
    jitted = cells["jitted"]
    lowered = jitted.lower(state, acc, sharded, jnp.float32(0.0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))

    tflops_achieved = flops / dt / 1e12
    gbs_achieved = bytes_acc / dt / 1e9
    print(f"batch={BATCH} step={dt*1000:.1f} ms  imgs/s/chip={BATCH/dt:.2f}")
    print(f"HLO flops/step: {flops/1e9:.1f} GFLOP  "
          f"({flops/BATCH/1e9:.1f} GFLOP/img)")
    print(f"HLO bytes/step: {bytes_acc/1e9:.2f} GB  "
          f"({bytes_acc/BATCH/1e9:.2f} GB/img)")
    print(f"achieved: {tflops_achieved:.1f} TFLOP/s "
          f"({100*tflops_achieved/V5E_PEAK_BF16_TFLOPS:.1f}% of bf16 peak), "
          f"{gbs_achieved:.0f} GB/s "
          f"({100*gbs_achieved/V5E_PEAK_HBM_GBS:.1f}% of HBM peak)")
    sol_compute = flops / (V5E_PEAK_BF16_TFLOPS * 1e12)
    sol_mem = bytes_acc / (V5E_PEAK_HBM_GBS * 1e9)
    sol = max(sol_compute, sol_mem)
    bound = "compute" if sol_compute > sol_mem else "bandwidth"
    print(f"speed of light: {sol*1000:.1f} ms/step ({BATCH/sol:.1f} imgs/s, "
          f"{bound}-bound) -> currently at {100*sol/dt:.1f}% of SoL")


if __name__ == "__main__":
    main()
