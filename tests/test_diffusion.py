"""Tests for the Gaussian diffusion process and scan-compiled samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule


@pytest.fixture(scope="module")
def diff():
    return GaussianDiffusion(make_schedule(linear_beta_schedule(50)))


def test_q_sample_closed_form(diff):
    x0 = jnp.ones((4, 8, 8, 1))
    noise = jnp.full_like(x0, 0.5)
    t = jnp.array([0, 10, 25, 49])
    out = diff.q_sample(x0, t, noise)
    s = diff.schedule
    for i, ti in enumerate([0, 10, 25, 49]):
        expected = s.sqrt_alphas_cumprod[ti] * 1.0 + (
            s.sqrt_one_minus_alphas_cumprod[ti] * 0.5
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), float(expected), rtol=1e-5
        )


def test_q_sample_matches_torch_style_extract(diff):
    """Cross-check the gather/broadcast against an independent numpy calc."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([1, 20, 44])
    out = np.asarray(diff.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    s = diff.schedule
    sa = np.asarray(s.sqrt_alphas_cumprod)[t][:, None, None, None]
    sb = np.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
    np.testing.assert_allclose(out, sa * x0 + sb * noise, rtol=1e-5)


def test_plain_mse_loss_perfect_model_is_zero(diff):
    x0 = jax.random.normal(jax.random.key(0), (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.array([5, 30])
    # A "perfect" model that returns the true noise gives zero loss.
    loss = diff.p_losses(lambda x, tt: noise, x0, t, noise)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)


def test_min_snr_loss_weighting():
    d = GaussianDiffusion(
        make_schedule(linear_beta_schedule(50)), loss_type="min_snr", min_snr_gamma=5.0
    )
    x0 = jnp.zeros((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 40])
    # model returns constant 1 -> per-sample mse = 1; loss = mean(w)
    loss = d.p_losses(lambda x, tt: jnp.ones_like(x), x0, t, noise)
    snr = np.asarray(d.schedule.snr)[np.array([0, 40])]
    w = np.minimum(snr, 5.0) / snr
    assert float(loss) == pytest.approx(float(w.mean()), rel=1e-5)


def test_ancestral_sampler_shape_and_finiteness(diff):
    model_fn = lambda x, t: jnp.zeros_like(x)
    out = diff.p_sample_loop(model_fn, (2, 8, 8, 1), jax.random.key(0))
    assert out.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ancestral_matches_stepwise_python_loop(diff):
    """The lax.scan sampler must equal an explicit per-step Python loop with
    the same RNG stream (the reference's loop structure, diffusion.py:134-155)."""
    model_fn = lambda x, t: 0.1 * x
    shape = (1, 4, 4, 1)
    key = jax.random.key(42)
    got = diff.p_sample_loop(model_fn, shape, key)

    init_key, loop_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)
    for i in range(diff.timesteps - 1, -1, -1):
        t = jnp.full((1,), i, jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(loop_key, i), shape, jnp.float32)
        x = diff.p_sample_step(model_fn, x, t, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_segmented_ancestral_bit_identical(diff):
    """p_sample_loop_segmented must reproduce the single-scan result
    bit-for-bit: per-step noise is keyed by fold_in(loop_key, absolute_t)
    and loop_key derives only from the caller's key, so chaining segments
    with the same key replays the exact draws. This is the correctness
    contract behind dodging the remote tunnel's per-execution time cap
    (PERF.md '2D sampling')."""
    model_fn = lambda x, t: 0.1 * x
    shape = (2, 4, 4, 1)
    key = jax.random.key(7)
    whole = np.asarray(diff.p_sample_loop(model_fn, shape, key))
    for segments in (2, 3, diff.timesteps):  # incl. one-step-per-segment
        seg = np.asarray(diff.p_sample_loop_segmented(
            model_fn, shape, key, segments=segments
        ))
        np.testing.assert_array_equal(whole, seg)
    # partial-start chaining (the sample_from shape) also holds
    x_t = jax.random.normal(jax.random.key(1), shape)
    whole = np.asarray(diff.p_sample_loop(model_fn, shape, key,
                                          start_t=19, x_t=x_t))
    seg = np.asarray(diff.p_sample_loop_segmented(
        model_fn, shape, key, segments=3, start_t=19, x_t=x_t
    ))
    np.testing.assert_array_equal(whole, seg)


def test_ancestral_segments_scale_with_batch(monkeypatch):
    """On execution-capped tunnel backends the segment count must scale
    with the batch (per-step device time is ~linear in it): the base of 8
    was sized at the 2D protocol's batch 64, so batch 128 needs 16 shorter
    segments to keep per-execution time flat. Local backends stay at 1,
    and MRIJAX_SAMPLE_SEGMENTS remains an absolute override."""
    from mrijax.diffusion import gaussian

    monkeypatch.delenv("MRIJAX_SAMPLE_SEGMENTS", raising=False)
    monkeypatch.setattr(gaussian, "_is_tunnel_backend", lambda: True)
    f = gaussian.ancestral_segments_for_backend
    assert f() == 8  # unknown batch: the validated base
    assert f(batch_size=64) == 8
    assert f(batch_size=128) == 16
    assert f(batch_size=96) == 16  # ceil: never undershoot the cap margin
    assert f(batch_size=8) == 8  # scaling only goes up
    monkeypatch.setenv("MRIJAX_SAMPLE_SEGMENTS", "4")
    assert f(batch_size=256) == 4  # override is absolute
    monkeypatch.delenv("MRIJAX_SAMPLE_SEGMENTS")
    monkeypatch.setattr(gaussian, "_is_tunnel_backend", lambda: False)
    assert f(batch_size=512) == 1  # local backends: one fused scan


def test_ddim_perfect_eps_recovers_x0(diff):
    """With a model that returns the exact noise used in q_sample, DDIM from
    x_t must walk back to (nearly) x0."""
    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 1))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    start_t = 30
    t = jnp.full((1,), start_t, jnp.int32)
    x_t = diff.q_sample(x0, t, noise)
    out = diff.ddim_sample(
        lambda x, tt: noise, x_t.shape, x_t=x_t, start_t=start_t, to_x0=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddim_strided_subset_close_to_full(diff):
    """Strided DDIM with a linear model should land near full-step DDIM."""
    model_fn = lambda x, t: 0.05 * x
    x_t = jax.random.normal(jax.random.key(3), (1, 8, 8, 1))
    full = diff.ddim_sample(model_fn, x_t.shape, x_t=x_t, to_x0=True)
    strided = diff.ddim_sample(model_fn, x_t.shape, x_t=x_t, num_steps=10, to_x0=True)
    err = np.abs(np.asarray(full) - np.asarray(strided)).mean()
    scale = np.abs(np.asarray(full)).mean()
    assert err / scale < 0.15


def test_ddim_sequence_reference_semantics(diff):
    seq = np.asarray(diff.ddim_timestep_sequence(start_t=10))
    np.testing.assert_array_equal(seq, np.arange(10, 0, -1))
    seq2 = np.asarray(diff.ddim_timestep_sequence(num_steps=5, start_t=40))
    assert seq2[0] == 40 and seq2[-1] == 1 and len(seq2) == 5
    assert np.all(np.diff(seq2) < 0)


def _nonlinear_model_fn(diff):
    """Smooth, deterministic, nonlinear ε-model for solver-order tests."""
    T = diff.timesteps

    def model_fn(x, t):
        tt = (t.astype(jnp.float32) / T).reshape(-1, *([1] * (x.ndim - 1)))
        return jnp.tanh(x) * (0.5 + tt)

    return model_fn


def test_dpm_order1_is_ddim(diff):
    """DPM-Solver++ with order=1 is algebraically the DDIM update — the two
    samplers must agree to fp32 reassociation noise on the same grid."""
    model_fn = _nonlinear_model_fn(diff)
    x_t = jax.random.normal(jax.random.key(7), (2, 8, 8, 1))
    for kw in ({"num_steps": 10}, {"num_steps": 10, "to_x0": True}, {}):
        ddim = np.asarray(diff.ddim_sample(model_fn, x_t.shape, x_t=x_t, **kw))
        dpm1 = np.asarray(
            diff.dpm_sample(model_fn, x_t.shape, x_t=x_t, order=1, **kw)
        )
        np.testing.assert_allclose(dpm1, ddim, rtol=1e-5, atol=1e-5)


def test_dpm2m_converges_faster_than_ddim(diff):
    """Second order must track the probability-flow ODE better per model
    evaluation: at an equal small step budget, DPM-2M's distance to the
    fine-grid solution is below DDIM's."""
    model_fn = _nonlinear_model_fn(diff)
    x_t = jax.random.normal(jax.random.key(11), (2, 8, 8, 1))
    # ground truth = the SECOND-order solver on the full 49-step grid: its
    # O(h^2) truncation error is ~40x below DDIM-49's O(h) error, and using
    # DDIM-49 as reference would cancel part of strided DDIM's correlated
    # first-order bias instead of measuring it
    ref = np.asarray(diff.dpm_sample(model_fn, x_t.shape, x_t=x_t))
    err = {}
    for steps in (12, 24):
        ddim = np.asarray(
            diff.ddim_sample(model_fn, x_t.shape, x_t=x_t, num_steps=steps)
        )
        dpm = np.asarray(
            diff.dpm_sample(model_fn, x_t.shape, x_t=x_t, num_steps=steps)
        )
        err[steps] = (
            np.abs(ddim - ref).mean(), np.abs(dpm - ref).mean()
        )
        assert err[steps][1] < err[steps][0], (steps, err[steps])
    # and the 2M error itself shrinks with more steps (measured second-order:
    # ~4x per step doubling vs DDIM's ~2x — the 8->32-step ladder in the
    # commit message's experiment)
    assert err[24][1] < err[12][1], err


def test_dpm_jittable_and_finite(diff):
    model_fn = lambda x, t: 0.05 * x

    @jax.jit
    def run(key):
        return diff.dpm_sample(model_fn, (2, 8, 8, 1), key, num_steps=6)

    out = np.asarray(run(jax.random.key(0)))
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(out).all()


def test_fast_sample_dispatch(diff):
    model_fn = lambda x, t: 0.05 * x
    x_t = jax.random.normal(jax.random.key(5), (1, 8, 8, 1))
    a = diff.fast_sample(model_fn, x_t.shape, x_t=x_t, num_steps=5, sampler="ddim")
    b = diff.ddim_sample(model_fn, x_t.shape, x_t=x_t, num_steps=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = diff.fast_sample(model_fn, x_t.shape, x_t=x_t, num_steps=5, sampler="dpm")
    d = diff.dpm_sample(model_fn, x_t.shape, x_t=x_t, num_steps=5)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    with pytest.raises(ValueError, match="unknown sampler"):
        diff.fast_sample(model_fn, x_t.shape, x_t=x_t, sampler="euler")
