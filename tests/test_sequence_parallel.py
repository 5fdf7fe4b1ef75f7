"""Sequence-parallel attention vs the single-device reference on the
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrijax.kernels.flash_attention import flash_attention
from mrijax.parallel import make_mesh
from mrijax.parallel.sequence import sequence_parallel_attention


def test_sp_attention_matches_reference():
    mesh = make_mesh(("model",))
    rng = np.random.default_rng(0)
    b, n, h, d = 2, 64, 4, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
               for _ in range(3))
    ref = flash_attention(q, k, v, impl="xla")
    got = sequence_parallel_attention(q, k, v, mesh=mesh, axis="model", impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sp_attention_grad_matches():
    mesh = make_mesh(("model",))
    rng = np.random.default_rng(1)
    b, n, h, d = 1, 32, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
               for _ in range(3))

    def loss_sp(q, k, v):
        return jnp.sum(
            sequence_parallel_attention(q, k, v, mesh=mesh, impl="xla") ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, impl="xla") ** 2)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_sp_attention_rejects_indivisible():
    mesh = make_mesh(("model",))
    q = jnp.zeros((1, 12, 2, 8))  # 12 not divisible by 8
    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_attention(q, q, q, mesh=mesh)


def test_sp_attention_inside_jit_under_data_axis():
    """2D mesh: batch over 'data', tokens over 'model' — both axes active."""
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    rng = np.random.default_rng(2)
    b, n, h, d = 2, 32, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
               for _ in range(3))

    @jax.jit
    def f(q, k, v):
        return sequence_parallel_attention(q, k, v, mesh=mesh, axis="model",
                                           impl="xla")

    got = f(q, k, v)
    ref = flash_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
