"""On-device color jitter (brightness/contrast/saturation/hue), pure JAX.

TPU-native half of the augmentation pipeline: the host draws the per-sample
jitter factors (deterministic per (seed, idx) — datasets/augmentations.py
``draw_jitter_params``) and ships the RESIZED UINT8 images + a tiny [B, 4]
factor array; the elementwise jitter math runs inside the jitted train step
where it fuses into the input casts for free. This removes the single
largest host cost of the loader hot path (measured ~8-10 ms/image of numpy
+ cv2 HSV work per sample on a 2-core host — docs/STATUS.md round-4 input
pipeline) and cuts host->device transfer 8x (uint8 instead of float32, no
pre-duplicated originals).

Semantics match the host path (augmentations._jitter_image — itself the
fused form of reference datasets/augmentations.py:244 colorjitter_sample):
    out = (img * b - mean(img*b)) * c + mean(img*b)        # brightness+contrast
    out = (out - gray(out)) * s + gray(out)                # saturation
    clip to [0, 1]; hue-rotate in HSV space
with the SAME factors applied to the target and every context frame of a
sample. The only intended deviation: hue rotates in continuous float HSV
here vs the host's uint8-quantized cv2 HSV (180-bin H channel) — a <1/180
hue-bin difference, inside the jitter noise itself (tests pin the two paths
against each other at that tolerance).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> HSV with H in [0,1) (continuous)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(spread, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(spread > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] HSV (H in [0,1)) -> RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def apply_jitter(image: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Jitter [B, H, W, 3] f32 images with per-sample factors [B, 4].

    params columns: (brightness b, contrast c, saturation s, hue shift h);
    a row of (1, 1, 1, 0) is the identity. Mirrors the host
    ``_jitter_image`` fused-affine form exactly (same mean/gray
    definitions), so the two paths agree to float rounding for h == 0.
    """
    b = params[:, 0][:, None, None, None]
    c = params[:, 1][:, None, None, None]
    s = params[:, 2][:, None, None, None]
    hshift = params[:, 3][:, None, None]
    # brightness + contrast collapse into one affine around the channel mean
    mean = jnp.mean(image.reshape(image.shape[0], -1, 3), axis=1)  # [B, 3]
    mean = mean[:, None, None, :] * (b * (1.0 - c))
    out = image * (b * c) + mean
    gray = jnp.sum(out, axis=-1, keepdims=True) * ((1.0 - s) / 3.0)
    out = out * s + gray
    out = jnp.clip(out, 0.0, 1.0)
    # hue rotation (skipped entirely when every shift is 0 is not knowable
    # at trace time; the HSV round-trip is cheap elementwise VPU work)
    hsv = rgb_to_hsv(out)
    h_rot = (hsv[..., 0] + hshift) % 1.0
    rot = hsv_to_rgb(jnp.stack([h_rot, hsv[..., 1], hsv[..., 2]], axis=-1))
    return jnp.clip(rot, 0.0, 1.0)
