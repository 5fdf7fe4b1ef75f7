"""Flash-attention fallback correctness vs naive attention."""

import jax
import jax.numpy as jnp
import numpy as np

from mrijax.kernels.flash_attention import flash_attention, _chunked_attention_xla
from mrijax.ops.attention import multi_head_self_attention


def _rand_qkv(key, b=2, n=300, h=4, d=16):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, n, h, d)),
        jax.random.normal(kk, (b, n, h, d)),
        jax.random.normal(kv, (b, n, h, d)),
    )


def test_chunked_matches_naive_unaligned_n():
    q, k, v = _rand_qkv(jax.random.key(0), n=300)
    naive = multi_head_self_attention(q, k, v)
    chunked = _chunked_attention_xla(q, k, v, q_chunk=128)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(naive), rtol=1e-5, atol=1e-6
    )


def test_flash_auto_on_cpu_matches_naive():
    q, k, v = _rand_qkv(jax.random.key(1), n=64)
    out = flash_attention(q, k, v)
    naive = multi_head_self_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(naive), rtol=1e-5, atol=1e-6
    )


def test_flash_gradients_flow():
    q, k, v = _rand_qkv(jax.random.key(2), n=130)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, q_chunk=64) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
        assert float(jnp.abs(gi).sum()) > 0


def test_pallas_fwd_and_bwd_match_xla_interpret():
    """Pallas forward AND the fused Pallas backward vs the XLA reference, in
    interpreter mode (covers lse save, Δ, dq/dk/dv kernels, padding masks)."""
    from jax.experimental.pallas import tpu as pltpu

    from mrijax.kernels.flash_attention_pallas import flash_attention_pallas

    q, k, v = _rand_qkv(jax.random.key(3), b=1, n=300, h=2, d=16)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention_pallas(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_chunked_attention_xla(q, k, v, q_chunk=128) ** 2)

    with pltpu.force_tpu_interpret_mode():
        out_p = flash_attention_pallas(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(_chunked_attention_xla(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_unpadded_path_matches_xla_interpret():
    """Block-aligned N compiles the tail masks OUT of both the forward and
    the backward kernels (the Dh=32 VPU-cost fix, PERF.md "Flash
    attention") — this pins that the mask-free branch is still the same
    math. n=256 -> one 256-wide block, np_ == n, padded=False everywhere."""
    from jax.experimental.pallas import tpu as pltpu

    from mrijax.kernels.flash_attention_pallas import flash_attention_pallas

    q, k, v = _rand_qkv(jax.random.key(4), b=1, n=256, h=2, d=16)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention_pallas(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_chunked_attention_xla(q, k, v, q_chunk=128) ** 2)

    with pltpu.force_tpu_interpret_mode():
        out_p = flash_attention_pallas(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(_chunked_attention_xla(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
