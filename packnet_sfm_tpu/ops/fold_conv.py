"""Folded 3D conv over packed channels, and its exact fusion with the
following 2D conv (the PackNet "pack" layer, reference layers01.py:213-247).

The reference pack layer is ``Conv3d(1, d, 3)`` over [B, 1, Cp, H, W]
followed by a channel fold ``view(b, d*Cp, h, w)`` and a 2D conv
``Conv2D(d*Cp -> C, k)`` — with **no nonlinearity in between**
(layers01.py:236-246: conv3d -> view -> conv). Two exact formulations,
both of which avoid ever materializing a tensor with a small (lane-padded)
minor dimension:

- ``channel_conv3d``: the 3D conv alone, as one dense MXU conv with a
  banded [3, 3, Cp, d*Cp] kernel scattered from the w3 taps (used by the
  unpack layers, where a GroupNorm+ELU sits *before* the 3D conv so no
  fusion with the preceding 2D conv is possible).

- ``fused_pack_conv``: conv3d∘fold∘conv2d collapsed algebraically into a
  single (k+2)x(k+2) convolution over the **unexpanded** Cp channels. The
  composition is linear, so the merged kernel
  ``K[a+h, b+x, c', o] = sum_{z,j} w3[z,h,x,j] * w2[a, b, j*Cp + c'-z+1, o]``
  is exact in the interior. At image borders the composition differs from
  the merged conv (the reference zero-pads the *intermediate*, which is not
  the same as zero-padding the input); the difference is subtracted in
  closed form (ring/corner/bias corrections below). Result:
  bitwise-equivalent math at every pixel, ~2.5-4x fewer FLOPs, and no
  [B, H, W, d*Cp] activation in the train graph (the tensor family that
  previously OOMed conv backward at batch 4 on v5e). Spatially tiny layers
  (pack5) take the two-step path instead — the per-step merged-kernel
  construction does not amortize there (see ``_FUSE_MIN_POSITIONS``).

Gradients flow through the merged-kernel construction to both weight
tensors, so training and checkpoint formats are unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Benchmark-only escape hatch: PN_FOLD_BORDERS=0 skips the exact border-strip
# recompute (leaves a k//2-wide approximate ring). Used to attribute step
# time; never set in training/eval runs (test_fold_fusion pins exactness).
_EXACT_BORDERS = os.environ.get("PN_FOLD_BORDERS", "1") != "0"

def channel_conv3d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """3x3x3 conv over (channel-as-depth, H, W) emitting the folded layout.

    x: [B, H, W, Cp]; kernel: [3, 3, 3, 1, d] (kz, kh, kx, 1, d); bias: [d].
    Returns [B, H, W, d*Cp] with channel index j*Cp + c (j = 3D feature,
    matching the reference fold layers01.py:243-245).

    Two formulations by Cp size (docs/STATUS.md round-3/4 perf notes):

    - Cp <= 512 (every unpack layer): ONE dense 2D conv with a banded
      [3, 3, Cp, d*Cp] kernel scattered from the 27 w3 taps
      (K[h, x, c+z-1, j*Cp+c] = w3[z, h, x, j]). The band is mostly zeros
      (Cp/3 x redundant FLOPs) but it runs on the MXU; the 27-term
      shifted-FMA formulation was pure VPU/bandwidth work that cost ~31 ms
      for the unpack1 layer alone at 192x640 b8 (now 4.6 ms).
    - Cp > 512 (pack5's two-step path, Cp=2048): the banded kernel itself
      would be ~1.2 GB (f32 [3,3,2048,16384] plus layout copies — OOMs), so
      the 27 channel/spatially-shifted fused multiply-adds accumulate
      directly into the folded layout instead; at pack5's tiny spatial size
      the VPU pass is cheap. (A 512-channel-chunked banded-MXU variant was
      measured SLOWER — 33 vs 22 ms at b16 — the per-step scatter
      construction of 4x [3,3,514,4096] kernels dominates when the conv
      itself has only ~2k output positions; docs/STATUS.md round 4.)
    """
    b, h, w, cp = x.shape
    d = kernel.shape[-1]
    dtype = dtype or x.dtype
    w3f = kernel[:, :, :, 0, :].astype(jnp.float32)            # [3(z),3,3,d]
    if cp <= 512:
        c = jnp.arange(cp)
        jj = jnp.arange(d)
        out_idx = (jj[:, None] * cp + c[None, :]).reshape(-1)  # [d*cp]
        kk = jnp.zeros((3, 3, cp, d * cp), jnp.float32)
        for z in range(3):
            cin = c + z - 1
            valid = (cin >= 0) & (cin < cp)
            cin_b = jnp.broadcast_to(cin[None, :], (d, cp)).reshape(-1)
            val_b = jnp.broadcast_to(valid[None, :], (d, cp)).reshape(-1)
            # values [3,3,d*cp]: w3[z,h,x,j] per (j, c), zeroed where invalid
            vals = jnp.repeat(w3f[z], cp, axis=-1) * val_b[None, None, :]
            kk = kk.at[:, :, jnp.clip(cin_b, 0, cp - 1), out_idx].add(vals)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kk.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.repeat(bias.astype(dtype), cp)[None, None, None, :]

    xc = x.astype(dtype)
    kw_ = kernel.astype(dtype)
    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (1, 1)))
    acc = None
    for kz in range(3):
        for kh in range(3):
            for kx in range(3):
                shifted = xp[:, kh:kh + h, kx:kx + w, kz:kz + cp]
                tiled = jnp.tile(shifted, (1, 1, 1, d))
                wvec = jnp.repeat(kw_[kz, kh, kx, 0], cp)  # [d*Cp]
                term = tiled * wvec[None, None, None, :]
                acc = term if acc is None else acc + term
    return acc + jnp.repeat(bias.astype(dtype), cp)[None, None, None, :]


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Raw 2D conv, zero 'SAME' padding, NHWC/HWIO (no norm/activation)."""
    dtype = dtype or x.dtype
    p = kernel.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def pack_conv_two_step(x: jnp.ndarray, w3: jnp.ndarray, b3: jnp.ndarray,
                       w2: jnp.ndarray, b2: jnp.ndarray,
                       dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Reference-order two-step pack conv (3D conv, fold, 2D conv)."""
    z = channel_conv3d(x, w3, b3, dtype)
    return conv2d_same(z, w2, b2, dtype)


def _shift_cp(t: jnp.ndarray, z: int) -> jnp.ndarray:
    """Shift the Cp (second-to-last) axis for 3D-conv tap z: input channel c'
    contributes via intermediate channel c = c'-z+1, zero at fold edges."""
    if z == 0:
        return jnp.concatenate(
            [t[..., 1:, :], jnp.zeros_like(t[..., :1, :])], axis=-2)
    if z == 2:
        return jnp.concatenate(
            [jnp.zeros_like(t[..., :1, :]), t[..., :-1, :]], axis=-2)
    return t


def _placement(k2: int) -> jnp.ndarray:
    """One-hot P[h, u, a] = [u == h + a], h in 0..2, a in 0..k2-1.

    Turns the "accumulate tap (h, x) at kernel offset (h+a, x+b)" scatter
    into a pair of tiny matmul contractions — one einsum instead of 9
    dynamic-update-slices (the construction is op-count-bound, not
    FLOP-bound: docs/bench_fold_construct_probe.py).
    """
    h = jnp.arange(3)[:, None, None]
    u = jnp.arange(k2 + 2)[None, :, None]
    a = jnp.arange(k2)[None, None, :]
    return (u == h + a).astype(jnp.float32)


def _shift_cp3(t: jnp.ndarray) -> jnp.ndarray:
    """Stack the three z-shifted copies of ``t`` along a new leading axis."""
    return jnp.stack([_shift_cp(t, z) for z in range(3)])


def _merged_kernel(w3: jnp.ndarray, w2: jnp.ndarray, cp: int):
    """Collapse conv3d∘fold∘conv2d into one (k+2)x(k+2)xCpxCout kernel (f32).

    Valid in the interior (all intermediate taps in-image); see module
    docstring for the border treatment.

    Two einsums: contract (z, j) first — the [3,3,k,k,Cp,Cout] intermediate
    is ~15-45 MB for pack1-4 (pack5's Cp=2048 would be ~0.5 GB, but it takes
    the two-step path) — then place the 3x3 tap grid at its (h+a, x+b)
    offsets with the one-hot ``_placement`` contraction. This replaced 27
    per-tap einsums + 27 scatter-adds that cost ~3-4.4 ms per layer per
    step (op-count-bound; docs/bench_fold_construct_probe.py).
    """
    k2 = w2.shape[0]
    d = w3.shape[-1]
    cout = w2.shape[-1]
    w3f = w3[:, :, :, 0, :].astype(jnp.float32)                 # [3,3,3,d]
    w2f = w2.astype(jnp.float32).reshape(k2, k2, d, cp, cout)   # j major fold
    w2z = _shift_cp3(w2f)                                       # [3,k,k,d,cp,cout]
    tap = jnp.einsum("zhxj,zabjpo->hxabpo", w3f, w2z)
    p = _placement(k2)
    return jnp.einsum("hua,xvb,hxabpo->uvpo", p, p, tap)


def _merged_border_kernels4(w3_sl: jnp.ndarray, w2_sel: jnp.ndarray, cp: int):
    """All four border rings' 1D merged kernels in one batched construction.

    w3_sl: [4, 3 (kz), 3 (kt), d] — per ring, the w3 plane whose fixed tap
    produced it (kh=2 for top, kh=0 bottom, kx=2 left, kx=0 right); kt is
    the in-ring spatial tap. w2_sel: [4, m, k2, d*Cp, Cout] — the w2 rows
    (or columns) that hit each ring for each of the m border output rows.
    Returns [4, m, k2+2, Cp, Cout]. Same channel-shift algebra as
    ``_merged_kernel`` one dimension down, with one batched einsum per tap
    for all four rings — the border fix is op-count-bound, not FLOP-bound
    (docs/STATUS.md round 4).
    """
    q, n, k2 = w2_sel.shape[:3]
    d = w3_sl.shape[-1]
    cout = w2_sel.shape[-1]
    w3s = w3_sl.astype(jnp.float32)
    w2r = w2_sel.astype(jnp.float32).reshape(q, n, k2, d, cp, cout)
    w2z = _shift_cp3(w2r)                                # [3,4,m,k2,d,cp,cout]
    tap = jnp.einsum("qzkj,zqnbjpo->qknbpo", w3s, w2z)
    return jnp.einsum("kub,qknbpo->qnupo", _placement(k2), tap)


def _ring_vec4(x_px: jnp.ndarray, w3_col: jnp.ndarray, cp: int) -> jnp.ndarray:
    """All four corners' ring values in one einsum.

    x_px: [4, B, Cp] (the corner pixels); w3_col: [4, 3 (kz), d].
    Returns [4, B, d*Cp] folded (j-major).
    """
    xp = jnp.pad(x_px.astype(jnp.float32), ((0, 0), (0, 0), (1, 1)))
    shifts = jnp.stack([xp[..., kz:kz + cp] for kz in range(3)])  # [3,4,B,Cp]
    return jnp.einsum("qzj,zqbc->qbjc", w3_col.astype(jnp.float32),
                      shifts).reshape(4, x_px.shape[1], -1)


# Crossover for the fused-vs-two-step choice (mode="auto"): the merged-kernel
# construction costs O(27·|w2|) weight-space traffic per step, amortized over
# B·H·W output positions. Measured on-chip at 192x640 b8 (docs/STATUS.md
# round-3 perf notes): pack5 (960 positions) fused 37.4 ms vs two-step
# 10.5 ms; pack4 (3840 positions) fused 8.1 ms vs two-step 13.9 ms.
_FUSE_MIN_POSITIONS = 2048


def build_fused_kernels(w3: jnp.ndarray, b3: jnp.ndarray, w2: jnp.ndarray,
                        b2: jnp.ndarray, cp: int) -> dict:
    """Construct every weight-only tensor the fused pack conv needs.

    Split from the application so the construction can be (a) timed on its
    own (docs/bench_fold_construct_probe.py) and (b) hoisted out of
    grad-accum microbatch scans, where it is loop-invariant. Returns a plain
    dict pytree; gradients flow through it to w3/w2/b3/b2 as before.
    """
    k2 = w2.shape[0]
    m = k2 // 2
    d = w3.shape[-1]
    cout = w2.shape[-1]

    kk = _merged_kernel(w3, w2, cp)
    # 3D-conv bias reaches every interior output through all k2*k2 taps
    w2r = w2.astype(jnp.float32).reshape(k2, k2, d, cp, cout)
    b3f = b3.astype(jnp.float32)
    b_eff = b2.astype(jnp.float32) + jnp.einsum("abjpo,j->o", w2r, b3f)
    out = {"kk": kk, "b_eff": b_eff}
    if not _EXACT_BORDERS:
        return out

    w3f = w3[:, :, :, 0, :]                                    # [kz, kh, kx, d]
    w2f = w2.astype(jnp.float32)

    i_near = [m - 1 - p for p in range(m)]     # ring hit for rows/cols 0..m-1
    i_far = [m + 1 + t for t in range(m)]      # ... for rows/cols H-1-t/W-1-t
    i_near_a, i_far_a = jnp.array(i_near), jnp.array(i_far)

    # Ring corrections: top/bottom rings (from x row 0 / H-1 via the w3
    # kh=2 / kh=0 planes), left/right (x col 0 / W-1 via kx=2 / kx=0).
    # The fix is op-count-bound (measured 10 ms of pack1's 28 ms at b16,
    # docs/STATUS.md round 4), so all four ring kernels are built in ONE
    # batched construction and applied as TWO feature-grouped convs
    # (top+bottom share the horizontal conv, left+right the vertical).
    w3_sl = jnp.stack([w3f[:, 2], w3f[:, 0], w3f[:, :, 2], w3f[:, :, 0]])
    w2_sel = jnp.stack([
        w2f[i_near_a], w2f[i_far_a],
        w2f[:, i_near_a].transpose(1, 0, 2, 3),
        w2f[:, i_far_a].transpose(1, 0, 2, 3)])        # [4,m,k2,dCp,cout]
    kk4 = _merged_border_kernels4(w3_sl, w2_sel, cp)   # [4,m,k2+2,cp,cout]

    def _k1(kern):                     # [m,k2+2,cp,cout] -> [k2+2,cp,m*cout]
        return kern.transpose(1, 2, 0, 3).reshape(k2 + 2, cp, m * cout)

    out["k_h"] = jnp.concatenate([_k1(kk4[0]), _k1(kk4[1])], axis=-1)[None]
    out["k_v"] = jnp.concatenate([_k1(kk4[2]), _k1(kk4[3])], axis=-1)[:, None]

    # Corner pieces (see apply: corner ring values subtracted twice).
    out["w3c4"] = jnp.stack(
        [w3f[:, 2, 2], w3f[:, 2, 0], w3f[:, 0, 2], w3f[:, 0, 0]])
    out["sel4"] = jnp.stack([
        w2f[i_near_a][:, i_near_a], w2f[i_near_a][:, i_far_a],
        w2f[i_far_a][:, i_near_a], w2f[i_far_a][:, i_far_a]])  # [4,m,m,dCp,cout]

    # Bias correction: b_eff assumed the 3D-conv bias at every z tap, but the
    # two-step path has bias only inside the image. Subtract the taps whose z
    # position is outside (inclusion-exclusion for the corners).
    w2b = jnp.einsum("abjpo,j->abo", w2r, b3f)                 # [k2,k2,cout]
    rowsum, colsum = w2b.sum(1), w2b.sum(0)
    out["bias_top"] = jnp.stack([rowsum[: m - p].sum(0) for p in range(m)])
    out["bias_bot"] = jnp.stack([rowsum[m + 1 + t:].sum(0) for t in range(m)])
    out["bias_left"] = jnp.stack([colsum[: m - q].sum(0) for q in range(m)])
    out["bias_right"] = jnp.stack([colsum[m + 1 + u:].sum(0) for u in range(m)])
    out["bc_tl"] = jnp.stack([jnp.stack([w2b[: m - p, : m - q].sum((0, 1))
                                         for q in range(m)]) for p in range(m)])
    out["bc_tr"] = jnp.stack([jnp.stack([w2b[: m - p, m + 1 + u:].sum((0, 1))
                                         for u in range(m)]) for p in range(m)])
    out["bc_bl"] = jnp.stack([jnp.stack([w2b[m + 1 + t:, : m - q].sum((0, 1))
                                         for q in range(m)]) for t in range(m)])
    out["bc_br"] = jnp.stack([jnp.stack([w2b[m + 1 + t:, m + 1 + u:].sum((0, 1))
                                         for u in range(m)]) for t in range(m)])
    return out


def apply_fused_kernels(x: jnp.ndarray, kn: dict, k2: int, cout: int,
                        dtype: jnp.dtype) -> jnp.ndarray:
    """Apply pre-built fused kernels (``build_fused_kernels``) to a batch."""
    b, h, w, cp = x.shape
    m = k2 // 2
    dn = ("NHWC", "HWIO", "NHWC")

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kn["kk"].astype(dtype), (1, 1),
        [(m + 1, m + 1), (m + 1, m + 1)], dimension_numbers=dn)
    y = y + kn["b_eff"].astype(dtype)
    if not _EXACT_BORDERS:
        return y

    x_h = jnp.concatenate([x[:, :1], x[:, -1:]], axis=-1)      # [B,1,W,2Cp]
    out_h = jax.lax.conv_general_dilated(
        x_h.astype(dtype), kn["k_h"].astype(dtype), (1, 1),
        [(0, 0), (m + 1, m + 1)], dimension_numbers=dn,
        feature_group_count=2).reshape(b, w, 2, m, cout)
    d_top = out_h[:, :, 0].transpose(0, 2, 1, 3)               # [B,m,W,cout]
    d_bot = out_h[:, :, 1].transpose(0, 2, 1, 3)[:, ::-1]      # t -> row H-1-t

    x_v = jnp.concatenate([x[:, :, :1], x[:, :, -1:]], axis=-1)  # [B,H,1,2Cp]
    out_v = jax.lax.conv_general_dilated(
        x_v.astype(dtype), kn["k_v"].astype(dtype), (1, 1),
        [(m + 1, m + 1), (0, 0)], dimension_numbers=dn,
        feature_group_count=2).reshape(b, h, 2, m, cout)
    d_left = out_v[:, :, 0]                                    # [B,H,m,cout]
    d_right = out_v[:, :, 1][:, :, ::-1]

    y = y.at[:, :m].add(-d_top)
    y = y.at[:, -m:].add(-d_bot)
    y = y.at[:, :, :m].add(-d_left)
    y = y.at[:, :, -m:].add(-d_right)

    # Corner ring values were subtracted by both their row and their column
    # correction — add each back once, all four corners in one einsum pair.
    px4 = jnp.stack([x[:, 0, 0], x[:, 0, -1], x[:, -1, 0], x[:, -1, -1]])
    vec4 = _ring_vec4(px4, kn["w3c4"], cp)                     # [4,B,dCp]
    delta4 = jnp.einsum("qstco,qbc->qbsto", kn["sel4"], vec4).astype(dtype)
    y = y.at[:, :m, :m].add(delta4[0])
    y = y.at[:, :m, -m:].add(delta4[1][:, :, ::-1])
    y = y.at[:, -m:, :m].add(delta4[2][:, ::-1])
    y = y.at[:, -m:, -m:].add(delta4[3][:, ::-1, ::-1])

    y = y.at[:, :m].add(-kn["bias_top"][None, :, None].astype(dtype))
    y = y.at[:, -m:].add(-kn["bias_bot"][None, ::-1, None].astype(dtype))
    y = y.at[:, :, :m].add(-kn["bias_left"][None, None].astype(dtype))
    y = y.at[:, :, -m:].add(-kn["bias_right"][None, None, ::-1].astype(dtype))
    y = y.at[:, :m, :m].add(kn["bc_tl"][None].astype(dtype))
    y = y.at[:, :m, -m:].add(kn["bc_tr"][None, :, ::-1].astype(dtype))
    y = y.at[:, -m:, :m].add(kn["bc_bl"][None, ::-1].astype(dtype))
    y = y.at[:, -m:, -m:].add(kn["bc_br"][None, ::-1, ::-1].astype(dtype))
    return y


def fused_pack_conv(x: jnp.ndarray, w3: jnp.ndarray, b3: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray,
                    dtype: Optional[jnp.dtype] = None,
                    mode: str = "auto") -> jnp.ndarray:
    """Exact pack conv as ONE conv over Cp channels + algebraic border fix.

    x: [B, H, W, Cp]; w3: [3,3,3,1,d]; w2: [k,k,d*Cp,Cout]. Output equals
    ``pack_conv_two_step`` at every pixel (up to dtype rounding).

    mode: "auto" picks fused vs two-step by the measured crossover
    (``_FUSE_MIN_POSITIONS``); "fused" forces the merged-kernel path
    (tests pin its exactness); "two_step" forces the reference-order path
    (set statically by the engine for space-partitioned meshes, where the
    border corrections' cross-shard .at[] updates explode SPMD compile
    time — see engine/train._resolve_pack_mode for the full tradeoff).

    Border treatment: the merged conv differs from the two-step composition
    only through (a) the 1-pixel ring of the intermediate z that the two-step
    path zero-pads but the merged conv evaluates from padded x, and (b) the
    3D-conv bias, which the two-step path applies only inside the image.
    Both errors are *subtracted in closed form*: the ring corrections are
    four 1D convs of a single edge row/column of x with tiny merged kernels
    (Cin = Cp, not d*Cp), corners are rank-1 einsums, and the bias error is
    a per-border-offset constant. This replaced a two-step strip recompute
    that cost ~30% of the whole train step (40 awkward thin-slab convs per
    network fwd; docs/STATUS.md round-3 perf notes).

    Implementation is split into ``build_fused_kernels`` (weight-only) +
    ``apply_fused_kernels`` (batch-dependent) so the construction can be
    timed and hoisted where it is loop-invariant.
    """
    b, h, w, cp = x.shape
    k2 = w2.shape[0]
    m = k2 // 2
    cout = w2.shape[-1]
    dtype = dtype or x.dtype
    if h < 2 * m + 2 or w < 2 * m + 2:
        # image too small for disjoint border regions; two-step is cheap
        return pack_conv_two_step(x, w3, b3, w2, b2, dtype)
    if mode == "two_step" or (mode == "auto" and b * h * w < _FUSE_MIN_POSITIONS):
        # spatially tiny layer (e.g. pack5 at 192x640): the per-step merged-
        # kernel construction costs more than the conv it saves
        return pack_conv_two_step(x, w3, b3, w2, b2, dtype)

    return apply_fused_kernels(x, build_fused_kernels(w3, b3, w2, b2, cp),
                               k2, cout, dtype)
