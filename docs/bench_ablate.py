"""Ablation timing: where do the step's milliseconds go?

Times fwd+bwd+update for stripped-down variants of the flagship train step
(PackNet01 self-sup 192x640 bf16, batch from PN_ABL_BATCH or 8):

  full            - the real step (4-scale photometric + smoothness)
  scales1         - photometric at 1 scale
  no_automask     - automask off (drops the identity-reprojection stack)
  no_ssim         - L1-only photometric
  depth_l1        - depth net only, L1 pull toward 0.5 (no pose/warp/SSIM)
  posenet_only    - pose net only, L1 on pose vec

Prints one JSON line per variant. Run alone on the chip.
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

import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import _flagship_model, _synthetic_batch

BATCH = int(os.environ.get("PN_ABL_BATCH", "8"))
H, W = 192, 640
WARMUP, ITERS = 2, 5


def time_step(step, state, acc0, sharded):
    from packnet_sfm_tpu.engine.train import zero_metrics

    acc = acc0
    for _ in range(WARMUP):
        state, acc = step(state, acc, sharded)
    assert np.isfinite(float(acc["loss"][0]))
    best = float("inf")
    for _ in range(2):
        acc = zero_metrics()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, acc = step(state, acc, sharded)
        assert np.isfinite(float(acc["loss"][0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def variant(name, mutate_cfg=None, loss_override=None):
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg, _ = _flagship_model()
    cfg.arch.dtype = "bfloat16"
    if mutate_cfg:
        mutate_cfg(cfg)
    model = setup_model(cfg.model, dtype=jnp.bfloat16)
    mesh = make_mesh()
    batch = _synthetic_batch(BATCH, H, W)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 100)
    state = replicate_state(TrainState.create(variables, tx), mesh)

    if loss_override is None:
        step = make_train_step(model, tx, mesh, compute_dtype=jnp.bfloat16)
    else:
        from packnet_sfm_tpu.engine.train import METRIC_KEYS

        def loss_fn(params, state_, b, rng):
            loss = loss_override(model, {"params": params,
                                         **({"batch_stats": state_.batch_stats}
                                            if state_.batch_stats else {})}, b, rng)
            return loss.astype(jnp.float32)

        def raw_step(state_, acc, b):
            rng = jax.random.fold_in(state_.rng, state_.step)
            b = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, b)
            loss, grads = jax.value_and_grad(loss_fn)(
                state_.params, state_, b, rng)
            upd, opt2 = tx.update(grads, state_.opt_state, state_.params)
            params2 = optax.apply_updates(state_.params, upd)
            acc2 = dict(acc)
            acc2["loss"] = acc["loss"] + jnp.stack([loss, jnp.float32(1.0)])
            return state_.replace(params=params2, opt_state=opt2,
                                  step=state_.step + 1), acc2

        jitted = jax.jit(raw_step, donate_argnums=(0, 1))
        step = lambda s, a, b, progress=0.0: jitted(s, a, b)

    sharded = shard_batch(batch, mesh)
    from packnet_sfm_tpu.engine.train import zero_metrics
    dt = time_step(step, state, zero_metrics(), sharded)
    print(json.dumps({"variant": name, "ms_per_step": round(dt * 1e3, 1),
                      "imgs_per_sec": round(BATCH / dt, 2)}), flush=True)
    return dt


def main():
    from packnet_sfm_tpu.models.sfm import model_forward

    variant("full")
    variant("scales1", mutate_cfg=lambda c: setattr(
        c.model.loss, "num_scales", 1))
    variant("no_automask", mutate_cfg=lambda c: setattr(
        c.model.loss, "automask_loss", False))
    variant("no_ssim", mutate_cfg=lambda c: setattr(
        c.model.loss, "ssim_loss_weight", 0.0))

    def depth_l1(model, variables, b, rng):
        out, _ = model_forward(
            model, variables, {"rgb": b["rgb"]}, rng, train=True)
        return sum(jnp.abs(d - 0.5).mean() for d in out["inv_depths"])

    variant("depth_l1", loss_override=depth_l1)

    def pose_only(model, variables, b, rng):
        pose_vars = {k: v["pose_net"] for k, v in variables.items()
                     if "pose_net" in v}
        vec = model.pose_net.apply(
            pose_vars, b["rgb"], b["rgb_context"], train=True)
        return jnp.abs(vec).mean()

    variant("posenet_only", loss_override=pose_only)


if __name__ == "__main__":
    main()
