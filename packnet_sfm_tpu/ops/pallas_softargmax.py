"""Pallas TPU kernel: streaming patch soft-argmax correspondence (NRS).

The generic (neural-ray-surface) camera projects a 3D direction field by
soft-argmax over dot-products with the reference ray surface in a local
(2*patch+1)^2 window (reference geometry/camera_generic.py:86-208). The XLA
path (geometry/camera_generic.generic_project) materializes per-row-chunk
logit tensors [B, rc, w, k, k]; this kernel streams the k^2 window positions
with an online (flash-attention-style) softmax so only [h, w] accumulators
ever exist, resident in VMEM scratch.

Structure. Window starts are border-clamped per axis (sy = clip(y-p, 0, h-k),
sx = clip(x-p, 0, w-k)). The y-axis clamping is folded into a precomputed
row stack: stack[dy] = rays[clip(y-p, 0, h-k) + dy] — a cheap XLA row gather
([B, k, 3, h, w], ~k× the rays bytes, tiny next to the XLA path's logits).
The Pallas grid then walks (batch, dy); each step DMA-pipelines one [3, h, w]
stack plane into VMEM and unrolls the k window columns, where the interior
columns are a static lane roll and the clamped border columns are two static
lane selects combined with an iota mask. The online-softmax state (running
max, sum, coordinate numerators) lives in VMEM scratch, which persists
across the sequential TPU grid; outputs flush on the last dy step.

The backward pass replays the stream with the saved (max, sum) statistics:
d(direction) accumulates across dy into a revisited output block, and the
per-dy stack gradient inverts the rolls/selects; d(rays) then falls out of
the VJP of the stack gather in XLA.

Gradients match jax.vjp of the dense formulation to ~1e-3 on O(10) grads
(tests/test_pallas.py), the same distance the dense f32 path sits from the
f64 truth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(h: int, w: int, patch: int) -> bool:
    k = 2 * patch + 1
    return h >= k and w >= k and h % 8 == 0


def _band(h: int) -> int:
    """Rows per kernel invocation: an 8-multiple dividing h, small enough
    that the k unrolled window columns' live temporaries fit VMEM."""
    for band in (16, 8):
        if h % band == 0:
            return band
    raise ValueError(f"h={h} not a multiple of 8 (see supported())")


def _roll_fn(interpret):
    # pltpu.roll is the Mosaic lane-roll; interpret mode (CPU tests) uses the
    # semantically identical jnp.roll. Mosaic requires non-negative shifts —
    # circular, so reduce mod the axis length.
    if interpret:
        return jnp.roll

    def roll(a, shift, axis):
        return pltpu.roll(a, shift % a.shape[axis], axis=axis)

    return roll


def _build_stack(rays: jnp.ndarray, patch: int) -> jnp.ndarray:
    """rays [B, 3, h, w] -> window-row stack [B, k, 3, h, w]:
    stack[:, dy, :, y] = rays[:, :, clip(y-p, 0, h-k) + dy]."""
    _, _, h, _ = rays.shape
    k = 2 * patch + 1
    sy = jnp.clip(jnp.arange(h) - patch, 0, h - k)      # [h]
    idx = sy[None, :] + jnp.arange(k)[:, None]          # [k, h]
    return rays[:, :, idx, :].transpose(0, 2, 1, 3, 4)


def _window_ray(plane, left, right, p: int, dx: int, k: int, w: int, roll):
    """Ray value at window column dx for every output column: interior = a
    static lane roll (col = x - p + dx); border-clamped = static lane
    selects (col = dx / w - k + dx)."""
    rolled = roll(plane, p - dx, axis=1)
    bcol = plane[:, dx][:, None]
    ccol = plane[:, w - k + dx][:, None]
    return jnp.where(left, bcol, jnp.where(right, ccol, rolled))


def _masks(band: int, h: int, w: int, p: int, k: int, row0):
    """Per-band masks/coords; ``row0`` is the band's absolute first row."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (band, w), 1)
    left = lane < p
    right = lane > (w - 1 - p)
    sx = jnp.clip(lane - p, 0, w - k).astype(jnp.float32)
    row = row0 + jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
    sy = jnp.clip(row - p, 0, h - k).astype(jnp.float32)
    return lane, left, right, sx, sy


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(temp_ref, dir_ref, stack_ref, ex_ref, ey_ref, m_ref, s_ref,
                macc, sacc, nyacc, nxacc,
                *, band: int, h: int, w: int, p: int, roll):
    """Grid = (B, h//band, k), dy innermost. Blocks: dir [1, 3, band, w]
    (revisited over dy), stack plane [1, 1, 3, band, w] (one per dy);
    outputs [1, band, w] flushed at dy = k-1."""
    k = 2 * p + 1
    r = pl.program_id(1)
    dy = pl.program_id(2)
    inv_t = 1.0 / temp_ref[0, 0]

    @pl.when(dy == 0)
    def _():
        macc[:] = jnp.full((band, w), jnp.float32(-1e30))
        sacc[:] = jnp.zeros((band, w), jnp.float32)
        nyacc[:] = jnp.zeros((band, w), jnp.float32)
        nxacc[:] = jnp.zeros((band, w), jnp.float32)

    dirs = [dir_ref[0, c].astype(jnp.float32) for c in range(3)]  # [band, w]
    planes = [stack_ref[0, 0, c].astype(jnp.float32) for c in range(3)]
    _, left, right, sx, sy = _masks(band, h, w, p, k, r * band)
    cy = sy + dy.astype(jnp.float32)   # absolute window-row coordinate

    m, s, ny, nx = macc[:], sacc[:], nyacc[:], nxacc[:]
    for dx in range(k):
        dot = jnp.zeros((band, w), jnp.float32)
        for c in range(3):
            dot = dot + dirs[c] * _window_ray(planes[c], left, right,
                                              p, dx, k, w, roll)
        logit = dot * inv_t
        new_m = jnp.maximum(m, logit)
        scale = jnp.exp(m - new_m)
        e = jnp.exp(logit - new_m)
        cx = sx + jnp.float32(dx)
        s = s * scale + e
        ny = ny * scale + e * cy
        nx = nx * scale + e * cx
        m = new_m
    macc[:], sacc[:], nyacc[:], nxacc[:] = m, s, ny, nx

    @pl.when(dy == k - 1)
    def _():
        denom = jnp.maximum(s, jnp.float32(1e-30))
        ex_ref[0] = nx / denom
        ey_ref[0] = ny / denom
        m_ref[0] = m
        s_ref[0] = s


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(temp_ref, dir_ref, stack_ref, ex_ref, ey_ref, m_ref, s_ref,
                gex_ref, gey_ref, ddir_ref, dstack_ref,
                *, band: int, h: int, w: int, p: int, roll):
    """Grid = (B, h//band, k), dy innermost. Replays window row dy with the
    saved softmax stats; d(dir) accumulates into a revisited
    [1, 3, band, w] block and the per-dy stack gradient
    [1, 1, 3, band, w] inverts the rolls/selects."""
    k = 2 * p + 1
    r = pl.program_id(1)
    dy = pl.program_id(2)
    inv_t = 1.0 / temp_ref[0, 0]

    @pl.when(dy == 0)
    def _():
        ddir_ref[0] = jnp.zeros((3, band, w), ddir_ref.dtype)

    dirs = [dir_ref[0, c].astype(jnp.float32) for c in range(3)]
    planes = [stack_ref[0, 0, c].astype(jnp.float32) for c in range(3)]
    lane, left, right, sx, sy = _masks(band, h, w, p, k, r * band)
    interior_x = jnp.logical_not(jnp.logical_or(left, right))
    cy = sy + dy.astype(jnp.float32)

    ex = ex_ref[0]
    ey = ey_ref[0]
    m = m_ref[0]
    s = jnp.maximum(s_ref[0], jnp.float32(1e-30))
    # Fold 1/(T * s) into the upstream grads: d logit_i = p_i * (...) / T.
    gx = gex_ref[0] / s * inv_t
    gy = gey_ref[0] / s * inv_t

    ddir = [jnp.zeros((band, w), jnp.float32) for _ in range(3)]
    dplane = [jnp.zeros((band, w), jnp.float32) for _ in range(3)]
    for dx in range(k):
        dot = jnp.zeros((band, w), jnp.float32)
        ray_vals = []
        for c in range(3):
            rv = _window_ray(planes[c], left, right, p, dx, k, w, roll)
            ray_vals.append(rv)
            dot = dot + dirs[c] * rv
        e = jnp.exp(dot * inv_t - m)  # = p_i * s
        cx = sx + jnp.float32(dx)
        wgt = e * (gx * (cx - ex) + gy * (cy - ey))  # [band, w]
        for c in range(3):
            ddir[c] = ddir[c] + wgt * ray_vals[c]
            contrib = wgt * dirs[c]
            # Invert the window-column map: interior -> inverse lane roll;
            # borders -> masked lane sums placed at lanes dx and w-k+dx.
            inter = roll(jnp.where(interior_x, contrib, 0.0), dx - p, axis=1)
            lsum = jnp.sum(jnp.where(left, contrib, 0.0), axis=1,
                           keepdims=True)
            rsum = jnp.sum(jnp.where(right, contrib, 0.0), axis=1,
                           keepdims=True)
            border = (jnp.where(lane == dx, 1.0, 0.0) * lsum
                      + jnp.where(lane == (w - k + dx), 1.0, 0.0) * rsum)
            dplane[c] = dplane[c] + inter + border

    for c in range(3):
        ddir_ref[0, c] = ddir_ref[0, c] + ddir[c]
        dstack_ref[0, 0, c] = dplane[c]


# ---------------------------------------------------------------------------
# JAX-facing API with custom VJP
# ---------------------------------------------------------------------------


def _specs(b, band, h, w, k):
    smem = pl.BlockSpec((1, 1), lambda i, r, dy: (0, 0),
                        memory_space=pltpu.SMEM)
    dir_spec = pl.BlockSpec((1, 3, band, w), lambda i, r, dy: (i, 0, r, 0),
                            memory_space=pltpu.VMEM)
    stack_spec = pl.BlockSpec((1, 1, 3, band, w),
                              lambda i, r, dy: (i, dy, 0, r, 0),
                              memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, band, w), lambda i, r, dy: (i, r, 0),
                              memory_space=pltpu.VMEM)
    return smem, dir_spec, stack_spec, plane_spec


def _stack_and_temp(rays, temperature, patch):
    return (_build_stack(rays.astype(jnp.float32), patch),
            jnp.full((1, 1), temperature, jnp.float32))


def _call_fwd(direction, rays, temperature, p, interpret):
    b, _, h, w = direction.shape
    k = 2 * p + 1
    band = _band(h)
    stack, temp = _stack_and_temp(rays, temperature, p)
    smem, dir_spec, stack_spec, plane_spec = _specs(b, band, h, w, k)
    kern = functools.partial(_fwd_kernel, band=band, h=h, w=w, p=p,
                             roll=_roll_fn(interpret))
    ex, ey, m, s = pl.pallas_call(
        kern,
        grid=(b, h // band, k),
        in_specs=[smem, dir_spec, stack_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * 4,
        out_specs=[plane_spec] * 4,
        scratch_shapes=[pltpu.VMEM((band, w), jnp.float32)] * 4,
        interpret=interpret,
    )(temp, direction.astype(jnp.float32), stack)
    return ex, ey, m, s


def _call_bwd(direction, rays, temperature, p, interpret, ex, ey, m, s,
              gex, gey):
    b, _, h, w = direction.shape
    k = 2 * p + 1
    band = _band(h)
    stack, pullback = jax.vjp(
        lambda r: _build_stack(r, p), rays.astype(jnp.float32))
    temp = jnp.full((1, 1), temperature, jnp.float32)
    smem, dir_spec, stack_spec, plane_spec = _specs(b, band, h, w, k)
    kern = functools.partial(_bwd_kernel, band=band, h=h, w=w, p=p,
                             roll=_roll_fn(interpret))
    ddir, dstack = pl.pallas_call(
        kern,
        grid=(b, h // band, k),
        in_specs=[smem, dir_spec, stack_spec,
                  plane_spec, plane_spec, plane_spec, plane_spec,
                  plane_spec, plane_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 3, h, w), jnp.float32),
        ],
        out_specs=[dir_spec, stack_spec],
        interpret=interpret,
    )(temp, direction.astype(jnp.float32), stack, ex, ey, m, s, gex, gey)
    (drays,) = pullback(dstack)
    return ddir, drays


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def softargmax_coords(direction, rays, temperature, patch, interpret=False):
    """Expected window coords for NRS projection, streamed in VMEM.

    direction, rays: [B, 3, h, w] (unit vectors, channels leading so the
    lane dimension is w). Returns (ex, ey): [B, h, w] absolute pixel coords.
    """
    ex, ey, _, _ = _call_fwd(direction, rays, temperature, patch, interpret)
    return ex, ey


def _vjp_fwd(direction, rays, temperature, patch, interpret):
    ex, ey, m, s = _call_fwd(direction, rays, temperature, patch, interpret)
    return (ex, ey), (direction, rays, ex, ey, m, s)


def _vjp_bwd(temperature, patch, interpret, res, g):
    direction, rays, ex, ey, m, s = res
    gex, gey = g
    ddir, drays = _call_bwd(direction, rays, temperature, patch, interpret,
                            ex, ey, m, s,
                            gex.astype(jnp.float32), gey.astype(jnp.float32))
    return ddir.astype(direction.dtype), drays.astype(rays.dtype)


softargmax_coords.defvjp(_vjp_fwd, _vjp_bwd)
