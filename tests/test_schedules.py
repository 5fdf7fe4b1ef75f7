"""Golden-value tests for diffusion schedules against closed-form math and
an independent torch-CPU recomputation of the reference formulas."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mrijax.diffusion import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)


def test_linear_schedule_endpoints():
    betas = np.asarray(linear_beta_schedule(1000))
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4, rel=1e-6)
    assert betas[-1] == pytest.approx(0.02, rel=1e-6)
    assert np.all(np.diff(betas) > 0)


def test_derived_buffers_closed_form():
    betas = linear_beta_schedule(100)
    s = make_schedule(betas)
    b = np.asarray(betas, dtype=np.float64)
    a = 1.0 - b
    acp = np.cumprod(a)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - acp), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recip_alphas), np.sqrt(1 / a), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s.snr), acp / (1 - acp), rtol=1e-4)
    post = b * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance), post, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_log_variance_clipped),
        np.log(np.clip(post, 1e-20, None)),
        rtol=1e-4,
    )


def test_cosine_schedule_matches_reference_formula():
    """Independent fp64 recomputation of Nichol-Dhariwal cosine betas with
    s=0.008 and clamp [1e-8, 0.999] (reference ddpm_3d_ldm/diffusion.py:50-56)."""
    T = 400
    s = 0.008
    x = np.linspace(0, T, T + 1)
    acp = np.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
    acp = acp / acp[0]
    betas_ref = np.clip(1 - acp[1:] / acp[:-1], 1e-8, 0.999)
    betas = np.asarray(cosine_beta_schedule(T))
    np.testing.assert_allclose(betas, betas_ref, rtol=1e-4, atol=1e-7)
    assert betas.min() >= 1e-8 and betas.max() <= 0.999


def test_cosine_matches_torch_implementation():
    torch = pytest.importorskip("torch")
    T = 400
    steps = T + 1
    x = torch.linspace(0, T, steps, dtype=torch.float32)
    acp = torch.cos(((x / T) + 0.008) / 1.008 * math.pi * 0.5) ** 2
    acp = acp / acp[0]
    betas_t = torch.clamp(1 - acp[1:] / acp[:-1], 1e-8, 0.999)
    # The torch side computes 1 - acp[1:]/acp[:-1] in fp32 — catastrophic
    # cancellation puts ~2e-7 absolute noise on β values as small as 1e-4,
    # so the comparison needs a loose rtol. Our fp64 schedule is the
    # accurate one (tested strictly in test_cosine_schedule_matches_
    # reference_formula); this test only checks formula agreement.
    np.testing.assert_allclose(
        np.asarray(cosine_beta_schedule(T)),
        betas_t.numpy(),
        rtol=5e-3,
        atol=1e-6,
    )
