"""Probe: can a Mosaic (Pallas-TPU) kernel beat XLA's gather row rate for
the stacked warp? (VERDICT r4 next-3 — turn "blocked on Pallas gather
support" into data.) ANSWER: NO — measured negative result, three ways.

The warp's cost is the FORWARD gather (docs/bench_warp_probe.py: fwd-only
73.5 ms == fwd+bwd 73.8 ms at [32,192,640]): 3.93M rows of 6 f32 lanes
from a [B, (H+1)*(W+1), 6] stack, ~15.8 ns/row under XLA at B=32.
Pallas-TPU has no gather primitive (jax 0.9). Findings (v5e, 2026-08-22):

1. The scalar-prefetch route (PrefetchScalarGridSpec) is IMPOSSIBLE at
   warp scale: the whole index array becomes a "prefetched SMEM operand"
   and must fit SMEM — measured rejection: 15.7 MB requested vs the 1 MB
   budget ("Allocation (size=15728640) would exceed memory (size=1048576)
   ... space=smem, tag='prefetched SMEM operand 0'").
2. Blocking the indices through SMEM per grid step works and is EXACT,
   but the per-row dynamic-slice scalar loop is SLOWER than XLA's gather:
   B=1 single-call minus 1.32 ms dispatch floor — XLA 4.26 ms,
   pallas[raw] 6.86 ms (1.6x), pallas[aligned] 9.38 ms (2.2x). The
   "8-aligned dynamic sublane offset" rule did NOT bite: the raw
   arbitrary-offset pl.ds row load compiles and is the faster variant.
3. On this AOT toolchain (axon chipless TpuAotCompiler) the kernel's
   full OUTPUT is stack-allocated in scoped VMEM: B>=2 (24 MB+) and any
   in-graph loop/chain around the call fail with "Ran out of memory in
   memory space vmem ... custom-call" — a production blocker on top of
   the unfavorable rate.

Defaults below reproduce the B=1 single-call comparison.

Run alone on the chip:  python docs/bench_pallas_gather_probe.py [batch]
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 192, 640
SRC = (H + 1) * (W + 1)
LANES = 8  # 6 payload f32 lanes padded to 8 for clean tiling


def xla_gather(stack, idx):
    # stack [B, SRC, LANES], idx [B, H*W] -> [B, H*W, LANES]
    return jnp.take_along_axis(stack, idx[..., None], axis=1)


def _kern_raw(idx_ref, img_ref, out_ref):
    def body(k, _):
        r = k // W
        j = k % W
        s = idx_ref[0, r, j]
        out_ref[0, r, pl.ds(j, 1), :] = img_ref[0, pl.ds(s, 1), :]
        return 0

    jax.lax.fori_loop(0, 8 * W, body, 0)


def _loop(fn, iters=5):
    """In-graph timing loop: serialized via a tiny loop-carried perturbation
    so the gather cannot be hoisted; dispatch cost amortizes over iters."""
    def run(stack, idx):
        def body(i, s):
            out = fn(stack + s, idx)
            return jnp.sum(out[0, 0]) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return run


def _kern_aligned(idx_ref, img_ref, out_ref):
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    def body(k, _):
        r = k // W
        j = k % W
        s = idx_ref[0, r, j]
        # clamp the block start so the 8-row window stays in bounds at the
        # ragged tail (SRC need not be a multiple of 8)
        s8 = jnp.minimum((s // 8) * 8, SRC - 8)
        block = img_ref[0, pl.ds(s8, 8), :]               # [8, LANES]
        sel = (rows8 == (s - s8)).astype(block.dtype)
        out_ref[0, r, pl.ds(j, 1), :] = jnp.sum(
            block * sel, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, 8 * W, body, 0)


def pallas_gather(stack, idx, kernel):
    # grid (B, H): one output row of W pixels per step; the whole source
    # image block ([SRC, LANES] f32 ~= 4 MB) stays resident in VMEM across
    # the H steps of each image (block index is unchanged in h). The row
    # indices flow through SMEM one W-row block at a time — scalar-
    # prefetching the WHOLE index array is impossible (measured: 15.7 MB
    # "prefetched SMEM operand" vs the 1 MB SMEM budget).
    body = _kern_raw if kernel == "raw" else _kern_aligned
    out = pl.pallas_call(
        body,
        grid=(B, H // 8),
        in_specs=[
            pl.BlockSpec((1, 8, W), lambda b, h: (b, h, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SRC, LANES), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, W, LANES), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, LANES), jnp.float32),
    )(idx.reshape(B, H, W), stack)
    return out.reshape(B, H * W, LANES)


def timeit(name, fn, *args):
    iters = 5
    jitted = jax.jit(_loop(fn, iters))
    float(jitted(*args))  # compile + force completion via host fetch
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / iters
    print(f"{name:32s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.uniform(size=(B, SRC, LANES)), jnp.float32)
    # warp-like indices: smooth displacement field
    ys, xs = np.mgrid[:H, :W]
    iy = np.clip(ys + rng.normal(scale=2.0, size=(B, H, W)), 0, H).astype(np.int32)
    ix = np.clip(xs + rng.normal(scale=6.0, size=(B, H, W)), 0, W).astype(np.int32)
    idx = jnp.asarray((iy * (W + 1) + ix).reshape(B, H * W))

    ref = np.asarray(xla_gather(stack, idx))

    # Single-call measurement (minus dispatch floor): the in-graph loop
    # harness cannot be used for the pallas kernels — finding 3 above.
    tiny = jax.jit(lambda x: x * 2.0)
    x0 = jnp.zeros((8, 128), jnp.float32)

    def single(fn, *a, n=20):
        np.asarray(fn(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*a)
        np.asarray(out)
        return (time.perf_counter() - t0) / n * 1000

    floor = single(tiny, x0)
    print(f"dispatch floor                  {floor:8.2f} ms")
    ms = single(jax.jit(xla_gather), stack, idx)
    print(f"xla take_along_axis             {ms:8.2f} ms ({ms - floor:.2f} net)")
    if B > 1:
        timeit("xla take_along_axis (in-loop)", xla_gather, stack, idx)

    for mode in ("raw", "aligned"):
        try:
            f = jax.jit(functools.partial(pallas_gather, kernel=mode))
            out = np.asarray(f(stack, idx))
            ok = np.array_equal(out, ref)
            print(f"pallas[{mode}] exact: {ok}")
            if ok:
                ms = single(f, stack, idx)
                print(f"pallas gather [{mode}]           {ms:8.2f} ms "
                      f"({ms - floor:.2f} net)")
        except Exception as e:
            print(f"pallas[{mode}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
