"""One-off probe: per-layer fwd+bwd time of the PackNet01 depth net.

Times each encoder/decoder block standalone (value_and_grad of a sum) at the
exact shapes the flagship 192x640 batch-8 bf16 train step uses, so hotspots
inside the 224 ms depth-net cost (bench_ablate depth_l1 variant) are
attributable. Run alone on the chip:

    python docs/bench_layer_probe.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 192, 640
ITERS = 10


def bench_module(name, mod, shape, train_kw=False):
    """fwd+bwd time per application, with ITERS applications chained INSIDE
    one jit (the tunneled chip's per-dispatch roundtrip would otherwise
    dominate sub-10ms layers)."""
    x = jnp.asarray(np.random.default_rng(0).uniform(size=shape), jnp.bfloat16)
    kw = {"train": False} if train_kw else {}
    variables = mod.init(jax.random.PRNGKey(0), x, **kw)

    def loss(v, x):
        return jnp.sum(mod.apply(v, x, **kw).astype(jnp.float32))

    @jax.jit
    def fwd_bwd_loop(v, x):
        def body(i, carry):
            s, xx = carry
            l, g = jax.value_and_grad(loss)(v, xx + s * 1e-20)
            leaves = jax.tree_util.tree_leaves(g)
            s2 = l + sum(jnp.sum(q.astype(jnp.float32)) for q in leaves)
            return (s2 * 1e-9, xx)
        out, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return out

    float(fwd_bwd_loop(variables, x))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_bwd_loop(variables, x))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / ITERS
    print(f"{name:28s} {str(shape):24s} {ms:7.2f} ms", flush=True)
    return ms


def main():
    from packnet_sfm_tpu.nn.layers import Conv2dBlock, ResidualBlock
    from packnet_sfm_tpu.nn.packnet import PackLayerConv3d, UnpackLayerConv3d

    b = BATCH
    total = 0.0
    total += bench_module("pre_calc Conv2dBlock(64,k5)", Conv2dBlock(64, 5, 1, jnp.bfloat16), (b, H, W, 3))
    total += bench_module("conv1 Conv2dBlock(64,k7)", Conv2dBlock(64, 7, 1, jnp.bfloat16), (b, H, W, 64))
    total += bench_module("pack1 (k5,d8)", PackLayerConv3d(64, 5, d=8, dtype=jnp.bfloat16), (b, H, W, 64))
    total += bench_module("conv2 ResBlock(64x2)", ResidualBlock(64, 2, 1, None, jnp.bfloat16), (b, H // 2, W // 2, 64), True)
    total += bench_module("pack2 (k3,d8)", PackLayerConv3d(64, 3, d=8, dtype=jnp.bfloat16), (b, H // 2, W // 2, 64))
    total += bench_module("conv3 ResBlock(128x2)", ResidualBlock(128, 2, 1, None, jnp.bfloat16), (b, H // 4, W // 4, 64), True)
    total += bench_module("pack3 (k3,d8)", PackLayerConv3d(128, 3, d=8, dtype=jnp.bfloat16), (b, H // 4, W // 4, 128))
    total += bench_module("conv4 ResBlock(256x3)", ResidualBlock(256, 3, 1, None, jnp.bfloat16), (b, H // 8, W // 8, 128), True)
    total += bench_module("pack4 (k3,d8)", PackLayerConv3d(256, 3, d=8, dtype=jnp.bfloat16), (b, H // 8, W // 8, 256))
    total += bench_module("conv5 ResBlock(512x3)", ResidualBlock(512, 3, 1, None, jnp.bfloat16), (b, H // 16, W // 16, 256), True)
    total += bench_module("pack5 (k3,d8)", PackLayerConv3d(512, 3, d=8, dtype=jnp.bfloat16), (b, H // 16, W // 16, 512))
    # decoder (version A channel plan)
    total += bench_module("unpack5 (512)", UnpackLayerConv3d(512, 3, d=8, dtype=jnp.bfloat16), (b, H // 32, W // 32, 512))
    total += bench_module("iconv5 Conv2dBlock(512)", Conv2dBlock(512, 3, 1, jnp.bfloat16), (b, H // 16, W // 16, 512 + 256))
    total += bench_module("unpack4 (256)", UnpackLayerConv3d(256, 3, d=8, dtype=jnp.bfloat16), (b, H // 16, W // 16, 512))
    total += bench_module("iconv4 Conv2dBlock(256)", Conv2dBlock(256, 3, 1, jnp.bfloat16), (b, H // 8, W // 8, 256 + 128))
    total += bench_module("unpack3 (128)", UnpackLayerConv3d(128, 3, d=8, dtype=jnp.bfloat16), (b, H // 8, W // 8, 256))
    total += bench_module("iconv3 Conv2dBlock(128)", Conv2dBlock(128, 3, 1, jnp.bfloat16), (b, H // 4, W // 4, 128 + 64 + 1))
    total += bench_module("unpack2 (64)", UnpackLayerConv3d(64, 3, d=8, dtype=jnp.bfloat16), (b, H // 4, W // 4, 128))
    total += bench_module("iconv2 Conv2dBlock(64)", Conv2dBlock(64, 3, 1, jnp.bfloat16), (b, H // 2, W // 2, 64 + 64 + 1))
    total += bench_module("unpack1 (64)", UnpackLayerConv3d(64, 3, d=8, dtype=jnp.bfloat16), (b, H // 2, W // 2, 64))
    total += bench_module("iconv1 Conv2dBlock(64)", Conv2dBlock(64, 3, 1, jnp.bfloat16), (b, H, W, 64 + 64 + 1))
    print(f"{'SUM of standalone layers':28s} {'':24s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
