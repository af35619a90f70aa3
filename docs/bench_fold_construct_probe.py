"""Probe: where does the fused pack conv's time go — kernel CONSTRUCTION
(weight-only einsum chains, per step) vs APPLICATION (the convs over the
batch)? Decides whether hoisting/restructuring the construction is worth it
(VERDICT r4 next-4). Run alone on the chip:

    python docs/bench_fold_construct_probe.py [batch]
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

from packnet_sfm_tpu.ops.fold_conv import (
    apply_fused_kernels, build_fused_kernels, fused_pack_conv)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = 10
DT = jnp.bfloat16


def timeit(name, fn, *args):
    jitted = jax.jit(fn)
    float(jitted(*args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / ITERS
    print(f"{name:42s} {ms:7.2f} ms fwd+bwd", flush=True)
    return ms


def loop(f):
    """ITERS fwd+bwd applications chained inside one jit (amortizes the
    tunneled dispatch)."""
    def run(*args):
        def body(i, s):
            perturbed = (args[0] + s * 1e-20,) + args[1:]
            l, g = jax.value_and_grad(
                lambda *a: jnp.sum(f(*a).astype(jnp.float32)),
                argnums=tuple(range(len(args))))(*perturbed)
            return (l + sum(jnp.sum(q.astype(jnp.float32))
                            for q in jax.tree_util.tree_leaves(g))) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return run


def probe(tag, b, h, w, cp, d, k2, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, cp)), DT)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 1, d)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 0.1, (d,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (k2, k2, d * cp, cout)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)

    print(f"--- {tag}: x[{b},{h},{w},{cp}] k2={k2} cout={cout}")
    full = timeit(f"{tag} full fused (fwd+bwd all)",
                  loop(lambda x, w3, b3, w2, b2: fused_pack_conv(
                      x, w3, b3, w2, b2, DT, mode="fused")),
                  x, w3, b3, w2, b2)
    build = timeit(f"{tag} build_fused_kernels only",
                   loop(lambda w3, b3, w2, b2: sum(
                       jnp.sum(v.astype(jnp.float32))
                       for v in build_fused_kernels(w3, b3, w2, b2, cp).values())),
                   w3, b3, w2, b2)
    kn = jax.tree_util.tree_map(
        jax.lax.stop_gradient, build_fused_kernels(w3, b3, w2, b2, cp))
    apply_ms = timeit(f"{tag} apply only (kernels constant)",
                      loop(lambda x: apply_fused_kernels(x, kn, k2, cout, DT)),
                      x)
    print(f"{tag}: full {full:.2f} = build {build:.2f} + apply {apply_ms:.2f} "
          f"(+ interaction {full - build - apply_ms:+.2f})")
    return full, build, apply_ms


def main():
    b = BATCH
    # pack1 folded shapes at 192x640 (Cp = 4*64, k5), pack2 (k3)
    probe("pack1", b, 96, 320, 256, 8, 5, 64)
    probe("pack2", b, 48, 160, 256, 8, 3, 64)
    # pack3/pack4 for completeness (auto-fused at these sizes)
    probe("pack3", b, 24, 80, 256, 8, 3, 128)
    probe("pack4", b, 12, 40, 512, 8, 3, 256)


if __name__ == "__main__":
    main()
