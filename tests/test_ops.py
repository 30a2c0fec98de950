"""Pallas kernels: parity vs XLA reference implementations (interpret mode
on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
    nt_xent_loss,
)
from ss25_hierarchical_multiscale_image_classification_tpu.ops import (
    fused_normalize,
    nt_xent_loss_pallas,
)


@pytest.mark.parametrize("n,d", [(16, 32), (64, 128)])
def test_nt_xent_pallas_value_parity(n, d):
    rng = np.random.default_rng(0)
    z_i = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    z_j = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ref = float(nt_xent_loss(z_i, z_j, temperature=0.5))
    ours = float(nt_xent_loss_pallas(z_i, z_j, temperature=0.5,
                                     block_r=16, block_c=16))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_nt_xent_pallas_blocking_invariance():
    rng = np.random.default_rng(1)
    z_i = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    z_j = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    a = float(nt_xent_loss_pallas(z_i, z_j, block_r=8, block_c=8))
    b = float(nt_xent_loss_pallas(z_i, z_j, block_r=16, block_c=24))
    assert a == pytest.approx(b, rel=1e-5)


def test_nt_xent_pallas_grad_parity():
    rng = np.random.default_rng(2)
    z_i = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    z_j = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)

    g_ref = jax.grad(
        lambda a, b: nt_xent_loss(a, b, 0.5), argnums=(0, 1)
    )(z_i, z_j)
    g_pl = jax.grad(
        lambda a, b: nt_xent_loss_pallas(a, b, 0.5, block_r=8, block_c=16),
        argnums=(0, 1),
    )(z_i, z_j)
    np.testing.assert_allclose(
        np.asarray(g_pl[0]), np.asarray(g_ref[0]), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pl[1]), np.asarray(g_ref[1]), rtol=1e-3, atol=1e-5
    )


def test_nt_xent_pallas_temperature():
    rng = np.random.default_rng(3)
    z_i = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    z_j = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    for tau in (0.1, 1.0):
        ref = float(nt_xent_loss(z_i, z_j, temperature=tau))
        ours = float(nt_xent_loss_pallas(z_i, z_j, temperature=tau,
                                         block_r=8, block_c=8))
        assert ours == pytest.approx(ref, rel=1e-4)


def test_fused_normalize_parity():
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        normalize,
    )

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (8, 16, 16, 3), np.uint8)
    out, means = fused_normalize(jnp.asarray(imgs), dtype=jnp.float32, block_b=4)
    ref = np.asarray(normalize(jnp.asarray(imgs)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(means), imgs.reshape(8, -1).mean(1), rtol=1e-5
    )


def test_mil_pool_pallas_parity():
    from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
        MILAttentionPooling,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.mil_pool import (
        mil_attention_pool_pallas,
    )

    rng = np.random.default_rng(7)
    b, k, d, h = 3, 32, 16, 8
    feats = jnp.asarray(rng.normal(size=(b, k, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, k)) > 0.3)
    module = MILAttentionPooling(hidden_dim=h)
    variables = module.init(jax.random.key(0), feats, mask)
    bag_ref, _attn = module.apply(variables, feats, mask)

    v = variables["params"]["V"]["kernel"]
    vb = variables["params"]["V"]["bias"]
    w = variables["params"]["w"]["kernel"][:, 0]
    bag_pl = mil_attention_pool_pallas(feats, mask, v, w, v_bias=vb, block_k=8)
    np.testing.assert_allclose(
        np.asarray(bag_pl), np.asarray(bag_ref), rtol=1e-4, atol=1e-5
    )
