"""Differentiable bilinear warp sampling (grid_sample equivalent), NHWC.

Capability parity with torch ``F.grid_sample(..., mode='bilinear',
align_corners=True)`` as used by the reference view-synthesis path
(geometry/camera_utils.py:58).

TPU notes: a bilinear tap gather over a C=3 image uses ~2% of the 128-lane
register a gather row occupies, and four taps mean four gathers — measured
131 ms fwd+bwd at the flagship loss shapes ([32, 192, 640, 3]), the single
largest cost of the whole train step (docs/bench_warp_probe.py, round 4).
The 'zeros' path therefore gathers ONCE from a pre-shifted 12-channel
padded stack (all four taps in one row, 4x lane utilization, 1/4 the
rows): 131 -> 96 ms at scale 0 and 35 -> 10 ms at scale 1, bitwise equal.
Measured gather cost is ~29 ms + ~4.6 ms per lane beyond 4 (3.9M rows),
so the 12 bf16 lanes are additionally BITCAST-PACKED into 6 f32 lanes
around the gather (bf16 pairs ride f32 lanes; unpack is a free bitcast):
96 -> 74 ms at scale 0, still bitwise equal. The transposed gradient
(scatter-add) falls out of JAX autodiff either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stacked_sample_zeros(image: jnp.ndarray, x, y, wx, wy) -> jnp.ndarray:
    """One-gather bilinear sample with zero padding (see module docstring).

    The stack is built from the 1px-zero-padded image so the gather index
    (y0+1, x0+1) is in-range for every tap the torch semantics can touch
    (x0 = -1 contributes its right tap); taps outside the image are zeroed
    by the same validity masks as the reference 4-gather formulation.
    """
    b, h, w, c = image.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    imgp = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    stack = jnp.concatenate([
        imgp[:, :-1, :-1], imgp[:, :-1, 1:],
        imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1)   # [B, H+1, W+1, 4C]
    ix = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    iy = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    flat_idx = (iy * (w + 1) + ix).reshape(b, -1)
    if stack.dtype == jnp.bfloat16 and (4 * c) % 2 == 0:
        # gather bf16 pairs as f32 lanes: same bytes, half the lanes
        flat = stack.reshape(b, (h + 1) * (w + 1), 2 * c, 2)
        flat32 = jax.lax.bitcast_convert_type(flat, jnp.float32)
        g32 = jnp.take_along_axis(flat32, flat_idx[..., None], axis=1)
        g = jax.lax.bitcast_convert_type(g32, jnp.bfloat16)
    else:
        flat = stack.reshape(b, (h + 1) * (w + 1), 4 * c)
        g = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
    g = g.reshape(b, x.shape[1], x.shape[2], 4, c)
    vx = ((x0 >= 0) & (x0 <= w - 1))[..., None]
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))[..., None]
    vy = ((y0 >= 0) & (y0 <= h - 1))[..., None]
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1))[..., None]
    dt = image.dtype
    v00 = g[..., 0, :] * (vx & vy).astype(dt)
    v01 = g[..., 1, :] * (vx1 & vy).astype(dt)
    v10 = g[..., 2, :] * (vx & vy1).astype(dt)
    v11 = g[..., 3, :] * (vx1 & vy1).astype(dt)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sample_pieces(image: jnp.ndarray, coords: jnp.ndarray):
    """Shared forward internals of the stacked zero-padding sample.

    Returns (out, g, x, y) where g is the raw gathered 4-tap stack
    [B, H', W', 4, C] and x/y are the unnormalized pixel coordinates —
    exactly what the custom backward needs to avoid any gather/scatter.
    """
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    imgp = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    stack = jnp.concatenate([
        imgp[:, :-1, :-1], imgp[:, :-1, 1:],
        imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1)   # [B, H+1, W+1, 4C]
    ix = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    iy = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    flat_idx = (iy * (w + 1) + ix).reshape(b, -1)
    if stack.dtype == jnp.bfloat16 and (4 * c) % 2 == 0:
        flat = stack.reshape(b, (h + 1) * (w + 1), 2 * c, 2)
        flat32 = jax.lax.bitcast_convert_type(flat, jnp.float32)
        g32 = jnp.take_along_axis(flat32, flat_idx[..., None], axis=1)
        g = jax.lax.bitcast_convert_type(g32, jnp.bfloat16)
    else:
        flat = stack.reshape(b, (h + 1) * (w + 1), 4 * c)
        g = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
    g = g.reshape(b, coords.shape[1], coords.shape[2], 4, c)
    out = _lerp_taps(g, x0, y0, wx, wy, h, w, image.dtype)
    return out, g, x, y


def _masked_taps(g, x0, y0, h, w, dt):
    vx = ((x0 >= 0) & (x0 <= w - 1))[..., None]
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))[..., None]
    vy = ((y0 >= 0) & (y0 <= h - 1))[..., None]
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1))[..., None]
    v00 = g[..., 0, :] * (vx & vy).astype(dt)
    v01 = g[..., 1, :] * (vx1 & vy).astype(dt)
    v10 = g[..., 2, :] * (vx & vy1).astype(dt)
    v11 = g[..., 3, :] * (vx1 & vy1).astype(dt)
    return v00, v01, v10, v11


def _lerp_taps(g, x0, y0, wx, wy, h, w, dt):
    v00, v01, v10, v11 = _masked_taps(g, x0, y0, h, w, dt)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grid_sample_data_zeros(hw, image: jnp.ndarray, coords: jnp.ndarray):
    out, _, _, _ = _sample_pieces(image, coords)
    return out


def _gsd_fwd(hw, image, coords):
    out, g, x, y = _sample_pieces(image, coords)
    return out, (g, x, y)


def _gsd_bwd(hw, res, ct):
    """d out / d coords from the saved taps — no gather, no scatter.

    out = (1-wy)[(1-wx)v00 + wx v01] + wy[(1-wx)v10 + wx v11] with
    wx = x - floor(x) (d/dx = 1 a.e.; floor and the validity masks are
    piecewise constant), so
      d out/d wx = (1-wy)(v01-v00) + wy(v11-v10)
      d out/d wy = (bot - top)
    chained through x = (cx+1)/2*(W-1). The image is DATA by contract
    (zero cotangent) — that is what makes the gather-free backward valid.
    """
    g, x, y = res
    h, w = hw
    dt = g.dtype
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v00, v01, v10, v11 = (v.astype(jnp.float32)
                          for v in _masked_taps(g, x0, y0, h, w, dt))
    ctf = ct.astype(jnp.float32)
    # f32 differencing matches autodiff's precision (products promote to f32
    # in the forward, so its backward is f32; bf16 differencing here would
    # cost ~0.3% relative gradient error).
    d_wx = jnp.sum(ctf * ((1 - wy) * (v01 - v00) + wy * (v11 - v10)), axis=-1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    d_wy = jnp.sum(ctf * (bot - top), axis=-1)
    d_cx = d_wx * (0.5 * (w - 1))
    d_cy = d_wy * (0.5 * (h - 1))
    d_coords = jnp.stack([d_cx, d_cy], axis=-1)
    d_image = jnp.zeros((g.shape[0], h, w, g.shape[-1]), dt)
    return d_image, d_coords


_grid_sample_data_zeros.defvjp(_gsd_fwd, _gsd_bwd)


def grid_sample_data(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """``grid_sample`` for the case where ``image`` is DATA, not a function
    of parameters (the photometric losses warp context FRAMES).

    Forward is bitwise-identical to ``grid_sample``. Backward treats the
    image as a constant (zero cotangent) and computes d/d-coords
    analytically from the forward's gathered taps.

    Measured NEGATIVE result (docs/bench_warp_probe.py, round 5): this does
    NOT speed up the warp — XLA's autodiff backward was already gather-free
    (coordinate gradients only flow through the lerp weights; fwd-only
    73.5 ms ≈ fwd+bwd 73.8 ms at [32,192,640]). The FORWARD gather is the
    wall. Kept because the explicit data contract documents the math and
    gives a hook for backward-memory experiments.

    Do NOT use where the sampled image requires gradient (e.g. warping a
    predicted feature map) — use ``grid_sample``.
    """
    if padding_mode != "zeros":
        return grid_sample(image, coords, padding_mode)
    return _grid_sample_data_zeros(tuple(image.shape[1:3]), image, coords)


def grid_sample(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``image`` [B, H, W, C] at ``coords`` [B, H', W', 2].

    ``coords[..., 0]`` is x and ``coords[..., 1]`` is y, normalized to [-1, 1]
    with align_corners=True semantics (-1 -> pixel 0, +1 -> pixel S-1).

    padding_mode:
      'zeros'  — out-of-bounds taps contribute 0 (torch 'zeros').
      'border' — coordinates clamp to the edge (torch 'border').
    """
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    if padding_mode == "zeros":
        return _stacked_sample_zeros(image, x, y, wx, wy)

    def gather(ix, iy):
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat_idx = (iy_c * w + ix_c).reshape(b, -1)  # [B, H'W']
        flat_img = image.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat_img, flat_idx[..., None], axis=1)
        out = out.reshape(b, coords.shape[1], coords.shape[2], c)
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
            out = out * valid[..., None].astype(image.dtype)
        return out

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
