"""Fused attention kernel: numerical parity with the XLA path (interpret
mode on CPU; the same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hmmc_tpu.ops.pallas_attention as pa
from hmmc_tpu.ops.attention import causal_mask, dot_product_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU has no Mosaic backend; run the kernel in interpreter mode."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pa.pl, "pallas_call",
        functools.partial(orig, interpret=True))
    yield


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_fused_matches_xla_nomask():
    b, h, l, d = 2, 3, 50, 32
    q, k, v = (_rand((b, h, l, d), i) for i in range(3))
    ours = pa.fused_attention(q, k, v, False)
    ref = dot_product_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_xla_causal():
    b, h, l, d = 2, 2, 77, 64
    q, k, v = (_rand((b, h, l, d), 10 + i) for i in range(3))
    ours = pa.fused_attention(q, k, v, True)
    ref = dot_product_attention(q, k, v, causal_mask(l))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_gradient_matches_xla():
    b, h, l, d = 1, 2, 33, 16
    q, k, v = (_rand((b, h, l, d), 20 + i) for i in range(3))

    def f_ours(q, k, v):
        return jnp.sum(pa.fused_attention(q, k, v, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, causal_mask(l)) ** 2)

    g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-3)


def test_fused_gradient_matches_xla_noncausal_unaligned():
    """The round-4 fused backward kernel at a lane/sublane-UNALIGNED
    geometry (L=50, Dh=32 — the blocks are read without explicit
    padding, so Mosaic's internal tail masking is on the line here;
    on-chip parity at L=197 is additionally verified in round-4 logs)."""
    b, h, l, d = 2, 3, 50, 32
    q, k, v = (_rand((b, h, l, d), 40 + i) for i in range(3))

    def f_ours(q, k, v):
        return jnp.sum(pa.fused_attention(q, k, v, False) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, None) ** 2)

    g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-3)


def test_flash_entry_mask_fallback():
    b, h, l, d = 1, 2, 16, 16
    q, k, v = (_rand((b, h, l, d), 30 + i) for i in range(3))
    mask = jnp.zeros((1, 1, l, l)).at[:, :, :, l // 2:].set(-1e9)
    out = pa.flash_attention(q, k, v, mask)
    ref = dot_product_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
