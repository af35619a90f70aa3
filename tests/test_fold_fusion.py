"""Fused pack-conv (conv3d∘fold∘conv2d collapsed to one conv) parity.

The pack layer's two convs have no nonlinearity between them (reference
layers01.py:236-246), so ops/fold_conv.fused_pack_conv must equal the
two-step path exactly (to dtype rounding) at every pixel — including the
image borders, where the merged kernel alone would differ (the reference
zero-pads the intermediate, not the input) and exact strips are pasted in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packnet_sfm_tpu.ops.fold_conv import fused_pack_conv, pack_conv_two_step


@pytest.mark.parametrize("k2,d,cp,h,w", [
    (5, 8, 16, 12, 14),   # pack1 shape family (5x5 conv)
    (3, 8, 16, 9, 11),    # pack2-5 family (3x3), odd sizes
    (3, 4, 12, 6, 6),     # PackNetSlim d=4, small image
    (3, 4, 8, 3, 3),      # too small for strips -> two-step fallback
])
def test_fused_pack_conv_matches_two_step(k2, d, cp, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cp).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, 3, 3, 1, d).astype(np.float32) * 0.2)
    b3 = jnp.asarray(rng.randn(d).astype(np.float32))
    w2 = jnp.asarray(rng.randn(k2, k2, d * cp, 24).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(24).astype(np.float32))

    a = pack_conv_two_step(x, w3, b3, w2, b2)
    # mode='fused' pins the merged-kernel path: these shapes are below
    # the auto crossover and would silently take the two-step path
    b = fused_pack_conv(x, w3, b3, w2, b2, mode="fused")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    # gradient parity wrt every operand
    g = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
    ga = jax.grad(lambda *p: jnp.vdot(pack_conv_two_step(*p), g),
                  argnums=(0, 1, 2, 3, 4))(x, w3, b3, w2, b2)
    gb = jax.grad(lambda *p: jnp.vdot(fused_pack_conv(*p, mode="fused"), g),
                  argnums=(0, 1, 2, 3, 4))(x, w3, b3, w2, b2)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=2e-4, atol=5e-4)


def test_packnet_fused_module_parity():
    """Same params (identical tree + init), same outputs, fuse on/off."""
    from packnet_sfm_tpu.nn.packnet import PackNetSlim01

    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 64, 3).astype(np.float32))
    net_f = PackNetSlim01(remat=False, fuse=True)
    net_u = PackNetSlim01(remat=False, fuse=False)
    p_f = net_f.init(jax.random.PRNGKey(0), x, train=False)
    p_u = net_u.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(p_f) == jax.tree_util.tree_structure(p_u)
    for a, b in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_f = net_f.apply(p_f, x, train=False)
    out_u = net_u.apply(p_f, x, train=False)
    for a, b in zip(out_f, out_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
