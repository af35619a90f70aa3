"""Warp (grid_sample) microbench at the flagship loss-stack shapes.

The photometric loss warps [n_ctx*B, Hs, Ws, 3] context stacks at 4 scales
(losses/photometric.py). grid_sample's 4 bilinear-tap gathers run with C=3
in the minor (lane) dimension — ~2% lane utilization if XLA pads rows to
the 128-lane register. This times fwd + bwd-to-coords (what the train step
differentiates: d loss / d coords -> depth & pose) for the current
formulation vs candidates, ITERS applications chained inside one jit so
the tunnel dispatch amortizes.

Run alone on the chip:  python docs/bench_warp_probe.py [batch]
"""

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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_CTX = 2
ITERS = 10


def bench(name, fn, img, coords):
    def loss(c, im):
        return jnp.sum(fn(im, c).astype(jnp.float32))

    @jax.jit
    def loop(im, c):
        def body(i, carry):
            s, cc = carry
            l, g = jax.value_and_grad(loss)(cc + s * 1e-20, im)
            return (l + jnp.sum(g.astype(jnp.float32)) * 1e-9, cc)
        out, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), c))
        return out

    float(loop(img, coords))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(img, coords))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / ITERS
    print(f"{name:28s} {str(tuple(img.shape)):24s} {ms:7.2f} ms", flush=True)
    return ms


def stacked_grid_sample(image, coords):
    """Candidate: ONE gather of a pre-shifted 12-channel padded stack
    (all 4 bilinear taps fetched in a single take_along_axis row)."""
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    imgp = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    stack = jnp.concatenate([
        imgp[:, :-1, :-1], imgp[:, :-1, 1:],
        imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1)   # [B, H+1, W+1, 4C]
    ix = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    iy = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    flat_idx = (iy * (w + 1) + ix).reshape(b, -1)
    flat = stack.reshape(b, (h + 1) * (w + 1), 4 * c)
    g = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
    g = g.reshape(b, coords.shape[1], coords.shape[2], 4, c)
    vx = ((x0 >= 0) & (x0 <= w - 1))[..., None]
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))[..., None]
    vy = ((y0 >= 0) & (y0 <= h - 1))[..., None]
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1))[..., None]
    dt = image.dtype
    v00 = g[..., 0, :] * (vx & vy).astype(dt)
    v01 = g[..., 1, :] * (vx1 & vy).astype(dt)
    v10 = g[..., 2, :] * (vx & vy1).astype(dt)
    v11 = g[..., 3, :] * (vx1 & vy1).astype(dt)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bench_fwd(name, fn, img, coords):
    """Forward-only: isolates the gather cost from the backward."""
    @jax.jit
    def loop(im, c):
        def body(i, carry):
            s, cc = carry
            out = fn(im, cc + s * 1e-20)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-9, cc)
        out, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), c))
        return out

    float(loop(img, coords))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(img, coords))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / ITERS
    print(f"{name:28s} {str(tuple(img.shape)):24s} {ms:7.2f} ms (fwd only)",
          flush=True)
    return ms


def main():
    from packnet_sfm_tpu.ops.warp import grid_sample, grid_sample_data

    rng = np.random.default_rng(0)
    for h, w in ((192, 640), (96, 320)):
        n = N_CTX * B
        img = jnp.asarray(rng.uniform(size=(n, h, w, 3)), jnp.bfloat16)
        # realistic SfM warp coords: identity grid + small disparity noise
        ys, xs = np.mgrid[:h, :w].astype(np.float32)
        un = 2 * xs / (w - 1) - 1 + rng.normal(scale=0.02, size=(n, h, w))
        vn = 2 * ys / (h - 1) - 1 + rng.normal(scale=0.005, size=(n, h, w))
        coords = jnp.asarray(np.stack([un, vn], -1), jnp.float32)
        a = np.asarray(grid_sample(img, coords).astype(jnp.float32))
        bs = np.asarray(stacked_grid_sample(img, coords).astype(jnp.float32))
        cs = np.asarray(grid_sample_data(img, coords).astype(jnp.float32))
        print(f"parity {h}x{w}: max|d| = {np.abs(a - bs).max():.2e} "
              f"(custom-vjp {np.abs(a - cs).max():.2e})", flush=True)
        # gradient parity of the custom bwd vs autodiff-through-gather
        g_auto = jax.grad(lambda c: jnp.sum(
            grid_sample(img, c).astype(jnp.float32)))(coords)
        g_cust = jax.grad(lambda c: jnp.sum(
            grid_sample_data(img, c).astype(jnp.float32)))(coords)
        gd = float(jnp.max(jnp.abs(g_auto - g_cust)))
        print(f"grad parity {h}x{w}: max|d| = {gd:.2e}", flush=True)
        bench_fwd(f"fwd gather  {h}x{w}", grid_sample, img, coords)
        bench(f"grid_sample {h}x{w}", grid_sample, img, coords)
        bench(f"custom_vjp  {h}x{w}", grid_sample_data, img, coords)


if __name__ == "__main__":
    main()
