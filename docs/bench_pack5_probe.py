"""One-off probe: pack5 two-step formulations at flagship b16 shapes.

The two-step path's channel_conv3d (Cp=2048 > the banded-MXU gate) runs as
27 channel/spatially-shifted FMAs, each materializing a [B,6,20,d*Cp] tile.
Because the [3,3,3] kernel is SHARED across packed channels (it only varies
with the 3D feature j), the same op is exactly a depthwise conv with
channel multiplier d over 3 channel-shifted copies of x — one XLA conv, no
27 tiles. This probe times both (fwd+bwd, chained in-graph), checks
exactness, and times the downstream w2 conv for attribution.

    python docs/bench_pack5_probe.py [batch]
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

from packnet_sfm_tpu.ops.fold_conv import channel_conv3d, conv2d_same

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
H, W, CP, D, COUT = 6, 20, 2048, 8, 512
ITERS = 10
DT = jnp.bfloat16


def channel_conv3d_depthwise(x, kernel, bias, dtype=None):
    """Same contract as channel_conv3d, as ONE grouped (depthwise) conv."""
    b, h, w, cp = x.shape
    d = kernel.shape[-1]
    dtype = dtype or x.dtype
    xc = x.astype(dtype)
    xp = jnp.pad(xc, ((0, 0), (0, 0), (0, 0), (1, 1)))
    # z-shifted copies: tap z reads input channel c + z - 1.
    xcat = jnp.concatenate([xp[..., z:z + cp] for z in range(3)], axis=-1)
    # Depthwise kernel, multiplier d: group g = z*cp + c emits outputs
    # g*d + j with value w3[z, h, x, j] (shared across c).
    w3f = kernel[:, :, :, 0, :]                                # [3(z),3,3,d]
    kd = jnp.broadcast_to(
        w3f.transpose(1, 2, 0, 3)[:, :, :, None, :],           # [3,3,3,1,d]
        (3, 3, 3, cp, d)).reshape(3, 3, 1, 3 * cp * d).astype(dtype)
    y = jax.lax.conv_general_dilated(
        xcat, kd, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=3 * cp)                            # [b,h,w,3*cp*d]
    y = y.reshape(b, h, w, 3, cp, d).sum(axis=3)               # [b,h,w,cp,d]
    y = y.transpose(0, 1, 2, 4, 3).reshape(b, h, w, d * cp)    # fold layout
    return y + jnp.repeat(bias.astype(dtype), cp)[None, None, None, :]


def conv2d_same_matmul(x, kernel, bias, dtype=None):
    """3x3 'SAME' conv as 9 shifted matmuls (huge-Cin small-spatial case)."""
    dtype = dtype or x.dtype
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    p = k // 2
    xp = jnp.pad(x.astype(dtype), ((0, 0), (p, p), (p, p), (0, 0)))
    kf = kernel.astype(dtype)
    acc = None
    for kh in range(k):
        for kx in range(k):
            t = xp[:, kh:kh + h, kx:kx + w, :].reshape(b * h * w, cin)
            y = t @ kf[kh, kx]
            acc = y if acc is None else acc + y
    return acc.reshape(b, h, w, -1) + bias.astype(dtype)


def timeit(name, fn, *args):
    def loss(*a):
        out = fn(*a)
        for _ in range(ITERS - 1):
            out = fn(a[0] + 0 * jnp.mean(out).astype(a[0].dtype), *a[1:])
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    r = g(*args)
    float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.mean(r))  # force
    t0 = time.perf_counter()
    r = g(*args)
    float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.mean(r))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:7.2f} ms fwd+bwd")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, CP)), DT)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 1, D)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (3, 3, D * CP, COUT)), DT)
    b2 = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)

    a = jax.jit(lambda x: channel_conv3d(x, w3, b3, DT))(x)
    b = jax.jit(lambda x: channel_conv3d_depthwise(x, w3, b3, DT))(x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |fma - depthwise| = {err:.3e} (bf16)")
    # Guard (ADVICE r4): a mathematically mismatched reformulation must not
    # produce timings that feed STATUS.md conclusions. Magnitudes here are
    # O(1)-O(10) in bf16 (8-bit mantissa), so 1e-1 absolute is the right bar.
    assert err < 1e-1, f"fma vs depthwise mismatch {err:.3e} — not comparable"

    timeit("channel_conv3d (27-FMA)", lambda x: channel_conv3d(x, w3, b3, DT), x)
    timeit("channel_conv3d (depthwise)",
           lambda x: channel_conv3d_depthwise(x, w3, b3, DT), x)
    timeit("two_step full (27-FMA + w2)",
           lambda x: conv2d_same(channel_conv3d(x, w3, b3, DT), w2, b2, DT), x)
    timeit("two_step full (depthwise + w2)",
           lambda x: conv2d_same(channel_conv3d_depthwise(x, w3, b3, DT),
                                 w2, b2, DT), x)
    c = jax.jit(lambda x: conv2d_same(x, w2, b2, DT))(a)
    m = jax.jit(lambda x: conv2d_same_matmul(x, w2, b2, DT))(a)
    err2 = float(jnp.max(jnp.abs(c.astype(jnp.float32) - m.astype(jnp.float32))))
    print(f"max |conv - matmul| = {err2:.3e} (bf16)")
    assert err2 < 1e-1, f"conv vs matmul mismatch {err2:.3e} — not comparable"
    timeit("w2 conv alone (XLA conv)", lambda z: conv2d_same(z, w2, b2, DT), a)
    timeit("w2 conv alone (9 matmuls)",
           lambda z: conv2d_same_matmul(z, w2, b2, DT), a)
    timeit("two_step full (27-FMA + matmul w2)",
           lambda x: conv2d_same_matmul(channel_conv3d(x, w3, b3, DT),
                                        w2, b2, DT), x)


if __name__ == "__main__":
    main()
