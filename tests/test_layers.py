"""FastGroupNorm unit hardening (VERDICT r2 weak #3 / ADVICE low).

Parity vs torch GroupNorm semantics (reference layers01.py:10-37 uses
nn.GroupNorm(16, C)) over shapes incl. real-resolution, dtypes (f32, bf16),
and adversarial large-mean inputs that expose one-pass E[x²]−E[x]²
cancellation — pinned against a float64 two-pass oracle (flax's own
GroupNorm cancels catastrophically there, so it is NOT the oracle).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from packnet_sfm_tpu.nn.layers import FastGroupNorm


def _oracle(x, scale, bias, g=16, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, g, c // g).astype(np.float64)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) / np.sqrt(var + eps)).reshape(b, h, w, c)
    return (y * scale + bias).astype(np.float32)


def _apply(x, scale, bias, dtype=None):
    v = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    return np.asarray(
        FastGroupNorm(num_groups=16, epsilon=1e-5, dtype=dtype).apply(v, x)
    ).astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 7, 9, 32), (2, 48, 64, 64),
                                   (1, 192, 640, 64)])
def test_matches_oracle_f32(shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = rng.normal(0.3, 1.2, size=shape).astype(np.float32)
    scale = rng.normal(1, 0.1, size=c).astype(np.float32)
    bias = rng.normal(0, 0.1, size=c).astype(np.float32)
    got = _apply(jnp.asarray(x), scale, bias)
    want = _oracle(x, scale, bias)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_matches_torch_groupnorm():
    """Direct semantics parity with the reference's nn.GroupNorm(16, C)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, size=(2, 24, 40, 64)).astype(np.float32)
    scale = rng.normal(1, 0.2, size=64).astype(np.float32)
    bias = rng.normal(0, 0.2, size=64).astype(np.float32)
    gn = torch.nn.GroupNorm(16, 64, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        want = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    got = _apply(jnp.asarray(x), scale, bias)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("mean,std,atol", [
    (100.0, 1.0, 1e-3), (1000.0, 1.0, 1e-3), (1e4, 1.0, 5e-3),
    (100.0, 0.01, 5e-3),
])
def test_large_mean_no_cancellation(mean, std, atol):
    """|mean| >> std must not destroy the variance (the raw one-pass
    E[x²]−E[x]² formula loses it entirely around mean/std ≈ 1e3)."""
    rng = np.random.default_rng(2)
    x = rng.normal(mean, std, size=(2, 48, 64, 64)).astype(np.float32)
    ones, zeros = np.ones(64, np.float32), np.zeros(64, np.float32)
    got = _apply(jnp.asarray(x), ones, zeros)
    want = _oracle(x, ones, zeros)
    np.testing.assert_allclose(got, want, atol=atol)


def test_structured_strided_bias():
    """All variance along H with the strided shift rows biased — the shift
    estimate being off by a few sigma must stay harmless."""
    rng = np.random.default_rng(3)
    ys = np.arange(48, dtype=np.float32)
    x = np.tile((1000.0 * (ys % 8 == 0)).reshape(1, 48, 1, 1), (2, 1, 64, 64))
    x = (x + rng.normal(0, 1, size=x.shape)).astype(np.float32)
    ones, zeros = np.ones(64, np.float32), np.zeros(64, np.float32)
    got = _apply(jnp.asarray(x), ones, zeros)
    want = _oracle(x, ones, zeros)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bf16_input():
    rng = np.random.default_rng(4)
    x = rng.normal(5, 1, size=(2, 48, 64, 64)).astype(np.float32)
    ones, zeros = np.ones(64, np.float32), np.zeros(64, np.float32)
    got = _apply(jnp.asarray(x).astype(jnp.bfloat16), ones, zeros,
                 dtype=jnp.bfloat16)
    want = _oracle(np.asarray(jnp.asarray(x).astype(jnp.bfloat16),
                              dtype=np.float32), ones, zeros)
    # bf16 output quantization dominates (~2^-8 relative)
    np.testing.assert_allclose(got, want, atol=0.05)
