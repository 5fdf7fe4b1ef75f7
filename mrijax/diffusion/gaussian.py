"""Gaussian diffusion: forward process, training losses, and samplers.

One conditioning-agnostic implementation replaces the reference's three
copy-pasted ``GaussianDiffusion`` classes
(`slice_cond_2d_ddpm/diffusion.py`, `ddpm_25d_all_modalities/diffusion.py`,
`ddpm_3d_ldm/diffusion.py`). The model is passed in as a function
``model_fn(x, t) -> eps`` — conditioning (z_pos, context, …) is closed over
by the caller, so 2D/2.5D/3D all share this code.

TPU-native design notes:
* The reverse process is a single ``lax.scan`` over the time axis — one
  compiled program instead of the reference's T-iteration Python loop with a
  device sync per step (`slice_cond_2d_ddpm/diffusion.py:134-155`).
* Per-step sampling noise comes from ``jax.random.fold_in`` on the loop
  index, keeping the scan carry small and the RNG reproducible.
* DDIM supports an arbitrary strided timestep subset (the fast path the
  reference lacks — it only exposes DDIM from a given ``start_t`` with
  stride 1, `ddpm_3d_ldm/diffusion.py:188-196`).

Losses:
* ``loss_type="mse"`` — plain MSE between predicted and true noise. This is
  the 2D/2.5D default: the reference's 2D min-SNR variant is a shadowing
  copy-paste that crashes on 4D tensors (diffusion.py:91-107), so shipped 2D
  checkpoints trained with plain MSE. Documented, not replicated.
* ``loss_type="min_snr"`` — per-sample MSE weighted by min(SNR, γ)/SNR
  (γ=5), matching the 3D latent trainer (`ddpm_3d_ldm/diffusion.py:84-100`)
  with a rank-agnostic reduction (the reference hardcodes 5D).
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mrijax.diffusion.schedules import DiffusionSchedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ancestral_segments_for_backend(batch_size: Optional[int] = None) -> int:
    """How many device executions a full-T ancestral scan should split into.

    Remote-tunnel TPU workers crash past roughly a minute of single-
    execution device time (measured thresholds in PERF.md "2D sampling"),
    so on such backends full-T loops run as RNG-identical segments
    (``p_sample_loop_segmented``; equality pinned by test). The base of
    8 keeps each segment under the cap with headroom for classifier-free
    guidance's 2× per-step cost and the documented ~2.5× slow-session
    variance (worst measured case: 125 steps × 2 × 2.5 × 85 ms ≈ 53 s at
    4 segments vs ≈ 27 s at 8; inter-segment dispatches are free — no
    host roundtrip). That sizing was measured at the 2D protocol's
    batch 64 — per-step device time scales with the batch, so callers
    that know their batch pass ``batch_size`` and the count scales up
    proportionally (bs 128 → 16 segments of half the steps: same device
    time per execution). Scaling only ever goes UP; smaller batches keep
    the safe base. Local backends return 1 (single fused scan).
    Override with ``MRIJAX_SAMPLE_SEGMENTS`` (absolute, not scaled)."""
    import math
    import os

    v = os.environ.get("MRIJAX_SAMPLE_SEGMENTS")
    if v:
        return max(1, int(v))
    if not _is_tunnel_backend():
        return 1
    scale = max(1, math.ceil((batch_size or 0) / 64))
    return 8 * scale


def _is_tunnel_backend() -> bool:
    """Whether the default backend is a remote-tunnel TPU (execution-time
    capped). Separated out so tests can monkeypatch it."""
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:
        return False
    return "axon" in str(pv).lower()


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch schedule values a[t] and reshape to (B, 1, ..., 1)."""
    out = a[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


@dataclass(frozen=True)
class GaussianDiffusion:
    """Functional diffusion process bound to a schedule.

    All methods are pure and jittable. ``model_fn`` arguments must already
    close over params and any conditioning.
    """

    schedule: DiffusionSchedule
    loss_type: str = "mse"  # "mse" | "min_snr"
    min_snr_gamma: float = 5.0

    @property
    def timesteps(self) -> int:
        return self.schedule.timesteps

    # ---------------------------------------------------------------- forward
    def q_sample(
        self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """Sample q(x_t | x_0) = √ᾱ_t x_0 + √(1-ᾱ_t) ε."""
        s = self.schedule
        nd = x_start.ndim
        return (
            _extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # ----------------------------------------------------------------- losses
    def p_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Noise-prediction loss. Returns a scalar (float32)."""
        x_noisy = self.q_sample(x_start, t, noise)
        predicted = model_fn(x_noisy, t)
        err2 = jnp.square(predicted.astype(jnp.float32) - noise.astype(jnp.float32))
        if self.loss_type == "mse":
            return jnp.mean(err2)
        if self.loss_type == "min_snr":
            reduce_axes = tuple(range(1, x_start.ndim))
            mse = jnp.mean(err2, axis=reduce_axes)  # (B,)
            snr_t = self.schedule.snr[t]
            w = jnp.minimum(snr_t, self.min_snr_gamma) / snr_t
            return jnp.mean(w * mse)
        raise ValueError(f"unknown loss_type {self.loss_type!r}")

    # --------------------------------------------------------------- sampling
    def p_sample_step(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """One ancestral reverse step p(x_{t-1} | x_t); ``noise`` is N(0, I)
        and is masked out at t == 0 (reference diffusion.py:110-132)."""
        s = self.schedule
        nd = x.ndim
        betas_t = _extract(s.betas, t, nd)
        sqrt_one_minus_t = _extract(s.sqrt_one_minus_alphas_cumprod, t, nd)
        sqrt_recip_alphas_t = _extract(s.sqrt_recip_alphas, t, nd)
        posterior_var_t = _extract(s.posterior_variance, t, nd)

        eps_theta = model_fn(x, t).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        mean = sqrt_recip_alphas_t * (xf - betas_t / sqrt_one_minus_t * eps_theta)
        nonzero = (t != 0).astype(jnp.float32).reshape(-1, *([1] * (nd - 1)))
        return (mean + nonzero * jnp.sqrt(posterior_var_t) * noise).astype(x.dtype)

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        *,
        start_t: Optional[int] = None,
        x_t: Optional[jnp.ndarray] = None,
        end_t: int = 0,
    ) -> jnp.ndarray:
        """Full (or partial, from ``start_t``) ancestral sampling as one scan.

        Covers the reference's ``p_sample_loop`` and ``sample_from``
        (`ddpm_3d_ldm/diffusion.py:128-165`).

        ``end_t`` stops the scan after processing timestep ``end_t``
        (default 0 = denoise to the end). Per-step noise is keyed by
        ``fold_in(loop_key, absolute_t)`` and ``loop_key`` derives only
        from ``key``, so chaining segments with the SAME key — e.g.
        ``x = loop(key, end_t=500); loop(key, x_t=x, start_t=499)`` —
        reproduces the single-scan draws bit-for-bit (pinned by test).
        ``p_sample_loop_segmented`` packages that chaining.
        """
        b = shape[0]
        start = self.timesteps - 1 if start_t is None else int(start_t)
        init_key, loop_key = jax.random.split(key)
        x0 = x_t if x_t is not None else jax.random.normal(init_key, shape, jnp.float32)

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(loop_key, i), shape, jnp.float32)
            return self.p_sample_step(model_fn, x, t, noise), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(start, int(end_t) - 1, -1))
        return x

    def p_sample_loop_auto(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        *,
        start_t: Optional[int] = None,
        x_t: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Ancestral sampling with backend-appropriate segmentation.

        Local backends run the single fused scan; remote-tunnel backends
        (which crash past ~1 min of single-execution device time, PERF.md
        "2D sampling") run ``ancestral_segments_for_backend()``
        RNG-identical segments. Callers must NOT wrap this in an outer
        ``jax.jit`` / ``shard_map`` — that fuses the segments back into
        one program and re-exposes the crash (use ``p_sample_loop`` there
        and keep per-execution time under the cap some other way)."""
        return self.p_sample_loop_segmented(
            model_fn, shape, key,
            segments=ancestral_segments_for_backend(batch_size=shape[0]),
            start_t=start_t, x_t=x_t,
        )

    def p_sample_loop_segmented(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        *,
        segments: int,
        start_t: Optional[int] = None,
        x_t: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Ancestral sampling split into ``segments`` device executions.

        Math- and RNG-identical to ``p_sample_loop`` (same key ⇒ same
        draws; pinned by test). ↗ No reference analog — this exists for
        environments that cap a single accelerator execution's runtime
        (e.g. remote-tunnel TPU workers crash past ~1 min of device time,
        PERF.md "2D sampling"): T=1000 at 2D-batch scale exceeds the cap
        as one scan, while segments of ~250 steps stream through
        back-to-back dispatches with no host roundtrip between them.

        The segment's start timestep rides the scan carry as a TRACED
        scalar (not a baked-in constant), so every equal-length segment
        shares ONE executable — without this, an 8-segment loop is 8
        distinct HLO programs and a remote worker charges its ~30-50 s
        compile round trip 8 times for a new batch size (PERF.md
        "Cold-setup anatomy"). A ragged tail segment (when steps don't
        divide evenly) is the only second program.
        """
        if segments < 1:
            raise ValueError(f"segments must be >= 1, got {segments}")
        start = self.timesteps - 1 if start_t is None else int(start_t)
        n_steps = start + 1
        seg = -(-n_steps // segments)  # ceil
        b = shape[0]
        init_key, loop_key = jax.random.split(key)
        x = x_t if x_t is not None else jax.random.normal(
            init_key, shape, jnp.float32
        )

        def run_segment(x, hi, length):
            # same body as p_sample_loop's scan, with the absolute
            # timestep derived from the traced carry: i = hi - k
            def step(carry, k):
                xc, hic = carry
                i = hic - k
                t = jnp.full((b,), 0, jnp.int32) + i
                noise = jax.random.normal(
                    jax.random.fold_in(loop_key, i), shape, jnp.float32
                )
                return (self.p_sample_step(model_fn, xc, t, noise), hic), None

            (x, _), _ = jax.lax.scan(
                step, (x, jnp.asarray(hi, jnp.int32)), jnp.arange(length)
            )
            return x

        hi = start
        while hi >= 0:
            lo = max(hi - seg + 1, 0)
            x = run_segment(x, hi, hi - lo + 1)
            hi = lo - 1
        return x

    def ddim_step(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
    ) -> jnp.ndarray:
        """Deterministic DDIM (η=0) step in x0-prediction form
        (`ddpm_3d_ldm/diffusion.py:167-186`). ``t_prev < 0`` means "to x0"
        (ᾱ_prev = 1)."""
        s = self.schedule
        nd = x.ndim
        a_t = _extract(s.alphas_cumprod, t, nd)
        a_prev = jnp.where(
            (t_prev >= 0).reshape(-1, *([1] * (nd - 1))),
            _extract(s.alphas_cumprod, jnp.maximum(t_prev, 0), nd),
            jnp.ones((), jnp.float32),
        )
        eps = model_fn(x, t).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        sqrt_a_t = jnp.sqrt(a_t)
        x0 = (xf - jnp.sqrt(1.0 - a_t) * eps) / jnp.maximum(sqrt_a_t, 1e-8)
        x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return x_prev.astype(x.dtype)

    def ddim_timestep_sequence(
        self, num_steps: Optional[int] = None, start_t: Optional[int] = None
    ) -> jnp.ndarray:
        """Descending timestep sequence for DDIM. With ``num_steps=None`` it
        reproduces the reference stride-1 schedule [start_t..1]; otherwise an
        evenly spaced subset of ``num_steps`` steps ending at t=0's neighbor.

        Computed host-side in numpy: the sequence is static given the Python
        int arguments, so it stays a compile-time constant even when
        ``ddim_sample`` is called inside a jitted function (``jnp.unique``
        would be a data-dependent-shape error under trace)."""
        import numpy as np

        start = self.timesteps - 1 if start_t is None else int(start_t)
        if num_steps is None or num_steps >= start:
            seq = np.arange(start, 0, -1, dtype=np.int32)
        else:
            seq = np.unique(
                np.linspace(start, 1, num_steps).round().astype(np.int32)
            )[::-1]
        return jnp.asarray(seq.copy())

    def ddim_sample(
        self,
        model_fn: ModelFn,
        shape,
        key: Optional[jax.Array] = None,
        *,
        num_steps: Optional[int] = None,
        start_t: Optional[int] = None,
        x_t: Optional[jnp.ndarray] = None,
        to_x0: bool = False,
    ) -> jnp.ndarray:
        """Deterministic DDIM sampling as one scan over a (possibly strided)
        timestep subset.

        With defaults it matches ``sample_from_ddim(x_t, start_t)``
        (`ddpm_3d_ldm/diffusion.py:188-196`), which stops at t=1→0 without a
        final ᾱ=1 step; ``to_x0=True`` appends that step. ``num_steps`` is
        the fast path for production sampling.
        """
        if x_t is None:
            if key is None:
                raise ValueError("need key when x_t is not given")
            x_t = jax.random.normal(key, shape, jnp.float32)
        b = shape[0]
        seq = self.ddim_timestep_sequence(num_steps, start_t)
        if len(seq) == 0:  # start_t=0: nothing to denoise (valid sweep edge)
            return x_t
        # Last transition: reference semantics end at the t=0 schedule entry
        # (`sample_from_ddim` loops down to i=1 with t_prev=i-1=0);
        # to_x0=True instead finishes with a true ᾱ_prev=1 step.
        last = jnp.full((1,), -1 if to_x0 else 0, jnp.int32)
        seq_prev = jnp.concatenate([seq[1:], last])

        def step(x, tt):
            t_i, t_prev_i = tt
            t = jnp.full((b,), t_i, dtype=jnp.int32)
            t_prev = jnp.full((b,), t_prev_i, dtype=jnp.int32)
            return self.ddim_step(model_fn, x, t, t_prev), None

        x, _ = jax.lax.scan(step, x_t, (seq, seq_prev))
        return x

    def dpm_sample(
        self,
        model_fn: ModelFn,
        shape,
        key: Optional[jax.Array] = None,
        *,
        num_steps: Optional[int] = None,
        start_t: Optional[int] = None,
        x_t: Optional[jnp.ndarray] = None,
        to_x0: bool = False,
        order: int = 2,
    ) -> jnp.ndarray:
        """DPM-Solver++(2M): deterministic second-order multistep sampler
        (Lu et al. 2022, data-prediction form) as one ``lax.scan``.

        ↗ No reference analog (its fastest path is stride-1 DDIM,
        `ddpm_3d_ldm/diffusion.py:188-196`): a second-order exponential
        integrator tracks the probability-flow ODE far more accurately per
        model evaluation than DDIM, so production sampling reaches DDIM-50
        quality in ~20 steps — a direct serving-throughput multiplier on
        top of the strided-DDIM superset. Same timestep grid, terminal
        convention, and signature as ``ddim_sample`` (``order=1`` IS DDIM —
        algebraically identical update, pinned by test), so the two are
        drop-in interchangeable everywhere ``ddim_steps`` is exposed.

        The update from time s to t (α=√ᾱ, σ=√(1−ᾱ), λ=log(α/σ),
        h=λ_t−λ_s, r=h_prev/h):
            x0_s  = (x_s − σ_s ε_θ(x_s, s)) / α_s
            D     = x0_s                                   (first step / order 1)
                  = (1 + 1/2r) x0_s − (1/2r) x0_prev       (order 2)
            x_t   = (σ_t/σ_s) x_s − α_t (e^{−h} − 1) D
        """
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order}")
        if x_t is None:
            if key is None:
                raise ValueError("need key when x_t is not given")
            x_t = jax.random.normal(key, shape, jnp.float32)
        b = shape[0]
        seq = self.ddim_timestep_sequence(num_steps, start_t)
        if len(seq) == 0:
            return x_t
        last = jnp.full((1,), -1 if to_x0 else 0, jnp.int32)
        seq_prev = jnp.concatenate([seq[1:], last])

        s = self.schedule
        nd = x_t.ndim

        def lam_of(a):
            # σ clamped so the terminal ᾱ_prev=1 step stays finite: λ→~46,
            # e^{−h}→0, σ_t/σ_s→0 and the update converges to x_t = D (the
            # exact "denoise to x0" limit)
            sigma = jnp.maximum(jnp.sqrt(1.0 - a), 1e-20)
            return 0.5 * jnp.log(a) - jnp.log(sigma), sigma

        def step(carry, tt):
            x, x0_prev, lam_prev, is_first = carry
            t_i, t_prev_i = tt
            t = jnp.full((b,), t_i, dtype=jnp.int32)
            a_s = _extract(s.alphas_cumprod, t, nd)
            a_t = jnp.where(
                (jnp.full((b,), t_prev_i) >= 0).reshape(-1, *([1] * (nd - 1))),
                _extract(s.alphas_cumprod,
                         jnp.full((b,), jnp.maximum(t_prev_i, 0)), nd),
                jnp.ones((), jnp.float32),
            )
            lam_s, sigma_s = lam_of(a_s)
            lam_t, sigma_t = lam_of(a_t)
            alpha_s = jnp.sqrt(a_s)
            alpha_t = jnp.sqrt(a_t)

            eps = model_fn(x, t).astype(jnp.float32)
            xf = x.astype(jnp.float32)
            x0 = (xf - sigma_s * eps) / jnp.maximum(alpha_s, 1e-8)

            h = lam_t - lam_s
            if order == 2:
                r = (lam_s - lam_prev) / h  # h_prev/h in λ-time
                c = 1.0 / (2.0 * jnp.maximum(r, 1e-8))
                d2 = (1.0 + c) * x0 - c * x0_prev
                # Force first order on the terminal to_x0 transition
                # (t_prev<0 ⇒ ᾱ_prev=1): there the σ clamp makes h huge, so
                # c = h_prev/(2h) would wildly extrapolate x0 − x0_prev.
                # Standard DPM-Solver++ `lower_order_final` behavior.
                is_final_x0 = jnp.asarray(t_prev_i < 0, jnp.float32)
                d = jnp.where((is_first > 0) | (is_final_x0 > 0), x0, d2)
            else:
                d = x0
            x_next = (sigma_t / sigma_s) * xf - alpha_t * jnp.expm1(-h) * d
            x_next = x_next.astype(x.dtype)
            return (x_next, x0, lam_s, jnp.zeros((), jnp.float32)), None

        init = (
            x_t,
            jnp.zeros_like(x_t, jnp.float32),
            jnp.zeros((b, *([1] * (nd - 1))), jnp.float32),
            jnp.ones((), jnp.float32),
        )
        (x, _, _, _), _ = jax.lax.scan(step, init, (seq, seq_prev))
        return x

    def fast_sample(
        self,
        model_fn: ModelFn,
        shape,
        key: Optional[jax.Array] = None,
        *,
        num_steps: Optional[int] = None,
        sampler: str = "ddim",
        **kw,
    ) -> jnp.ndarray:
        """Dispatch to a deterministic fast sampler by name:
        ``"ddim"`` (first-order, reference superset) or ``"dpm"`` /
        ``"dpm2m"`` (second-order DPM-Solver++(2M))."""
        if sampler == "ddim":
            return self.ddim_sample(model_fn, shape, key, num_steps=num_steps, **kw)
        if sampler in ("dpm", "dpm2m"):
            return self.dpm_sample(model_fn, shape, key, num_steps=num_steps, **kw)
        raise ValueError(f"unknown sampler {sampler!r} (ddim | dpm)")
