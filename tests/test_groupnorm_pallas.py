"""Fused GroupNorm+SiLU Pallas kernel vs the XLA reference, in interpreter
mode (TPU-free)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mrijax.kernels.groupnorm_pallas import group_norm_silu_pallas
from mrijax.ops.norms import group_norm_silu


@pytest.mark.parametrize("shape,groups", [
    ((2, 40, 128), 8),       # (B, N, C) flat
    ((1, 6, 10, 128), 8),    # (B, H, W, C), N=60 not block-aligned
    ((2, 3, 4, 5, 32), 4),   # (B, D, H, W, C) small
])
def test_matches_xla_reference(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu_pallas(x, scale, bias, groups)
    want = group_norm_silu(x, groups, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_input_fp32_stats():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32) * 10).astype(jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu_pallas(x, scale, bias, 8)
    assert got.dtype == jnp.bfloat16
    want = group_norm_silu(x, 8, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.1
    )


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 24, 32)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))

    def loss_pallas(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(group_norm_silu_pallas(x, s, b, 4) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_silu(x, 4, s, b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_differentiated_forward_is_xla_path():
    """Dispatch-on-differentiation (PERF.md "Known micro-headroom", closed):
    under vjp the custom_vjp fwd rule runs the XLA reference, so the primal
    OUTPUT of a differentiated call is bit-identical to group_norm_silu —
    no Pallas kernel (and no extra activation read) in a train step."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))

    # NO interpreter-mode context: if the Pallas body ran under vjp this
    # would fail on CPU (pallas_call unsupported) — passing proves the
    # differentiated path never touches the kernel.
    out, vjp_fn = jax.vjp(
        lambda xx, ss, bb: group_norm_silu_pallas(xx, ss, bb, 4),
        x, scale, bias,
    )
    want = group_norm_silu(x, 4, scale, bias)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    # gradients equal the XLA reference's gradients exactly
    g = jnp.ones_like(out)
    gx, gs, gb = vjp_fn(g)
    _, ref_vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu(xx, 4, ss, bb), x, scale, bias
    )
    rx, rs, rb = ref_vjp(g)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(rb))
