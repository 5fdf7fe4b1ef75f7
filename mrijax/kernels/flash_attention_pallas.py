"""Pallas TPU flash attention (online softmax over KV blocks).

Replaces the reference's materialized N×N softmax
(`ddpm_3d_ldm/unet_attention.py:44-52`) with an O(N·block) streaming
kernel, lifting the quadratic-memory wall that confines the reference's
attention to the 800-token bottleneck (full-latent N = 51 200 works):

* grid = (batch·heads, N/BLOCK_Q, N/BLOCK_K); the KV axis is the innermost
  (sequential) grid dimension, so per-(bh, q-block) running max / sum /
  accumulator live in VMEM scratch across KV steps.
* logits are computed on the MXU in fp32 (`preferred_element_type`),
  softmax statistics and the output accumulator are fp32; inputs may be
  bf16.
* tail KV blocks from padding are masked with -inf before the softmax.

Backward pass: fused Pallas kernels in the standard flash-bwd form — the
forward additionally saves the per-row logsumexp; the backward recomputes
p = exp(u − lse) blockwise (u = q′kᵀ with q′ = q·Dh^-1/2 pre-scaled) and
accumulates dV = pᵀ dO, dU = p∘(dO Vᵀ − Δ) (Δ = rowsum(dO∘O)), dK = dUᵀ q′,
dQ = scale·dU K over two passes (KV-major for dK/dV, Q-major for dQ).
O(N·block) memory like the forward; fp32 accumulators; padded rows/cols
masked (the mask — and at Dh=32 its measurable per-logit VPU cost — is
compiled out when N is block-aligned, as at the tuned N=51 200 shape).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults tuned on TPU v5e at N=51 200, Dh=32 (see PERF.md):
# (256, 512) -> 10.9 TFLOP/s eff; (1024, 2048) -> 20.9; larger blocks exceed
# VMEM. Small N uses smaller blocks to avoid padding waste (_pick_blocks).
BLOCK_Q = 1024
BLOCK_K = 2048
NEG_INF = -1e30


def _pick_blocks(n: int, block_q: int, block_k: int):
    """Short sequences use one block sized to N (rounded to the 128-lane
    tile) — padding to the tuned long-sequence blocks would multiply the
    work (e.g. the 800-token flagship bottleneck padded to 2048). Long
    sequences keep the tuned defaults."""
    if n <= 1024:
        b = ((n + 127) // 128) * 128
        return b, b
    return block_q, block_k


# Backward blocks are smaller: the (block_q × block_k) fp32 probability and
# score temporaries live in registers/VMEM alongside two (block, d)
# accumulators.
BWD_BLOCK_Q = 512
BWD_BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                  *, n, padded):
    """Kernel body. ``q`` arrives PRE-SCALED by Dh^-1/2 (folded once into
    the (N, Dh) tensor outside the kernel instead of one VPU multiply per
    logit — at Dh=32 the kernel is VPU-co-bound, see PERF.md "Flash
    attention"), and ``padded`` is a TRACE-TIME constant: when N is a
    multiple of the blocks (true for the tuned N=51 200 shape) the tail
    mask — an iota + compare + select per logit — is compiled out
    entirely."""
    kv_idx = pl.program_id(2)
    block_k = k_ref.shape[1]

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BLOCK_Q, Dh)
    k = k_ref[0]  # (BLOCK_K, Dh)
    v = v_ref[0]  # (BLOCK_K, Dh)
    # fp32 inputs need the full-precision MXU pass (the default rounds
    # operands to bf16 — measured ~8e-4 output error); bf16 inputs use the
    # native single pass.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (BLOCK_Q, BLOCK_K), scale already folded into q

    if padded:
        # Mask padded KV positions (tail block only).
        kv_start = kv_idx * block_k
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(kv_start + col < n, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (BLOCK_Q, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (BLOCK_Q, BLOCK_K)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (BLOCK_Q, Dh)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[:, :1], 1e-30)  # padded q rows have l=0
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_safe)


def _to_bh(x):
    b, n, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _from_bh(x, b, h):
    bh, n, d = x.shape
    return x.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _pad_n(x, np_):
    return jnp.pad(x, ((0, 0), (0, np_ - x.shape[1]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_forward(q, k, v, block_q=BLOCK_Q, block_k=BLOCK_K):
    out, _ = _flash_forward_lse(q, k, v, block_q=block_q, block_k=block_k)
    return out


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_forward_lse(q, k, v, block_q=BLOCK_Q, block_k=BLOCK_K):
    """Returns (out (B,N,H,Dh), lse (B*H, N, 1) fp32)."""
    b, n, h, d = q.shape
    block_q, block_k = _pick_blocks(n, block_q, block_k)
    scale = d ** -0.5

    # scale folded into q ONCE (an (N, Dh) multiply) instead of per logit
    # (an (N, N) multiply inside the kernel); for bf16 inputs the fold is
    # computed in fp32 then rounded — the same rounding class as the bf16
    # MXU pass itself
    qf = _to_bh((q.astype(jnp.float32) * scale).astype(q.dtype))
    kf, vf = _to_bh(k), _to_bh(v)
    np_ = n + ((-n) % max(block_q, block_k))
    if np_ != n:
        qf, kf, vf = (_pad_n(x, np_) for x in (qf, kf, vf))
    grid = (b * h, np_ // block_q, np_ // block_k)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, n=n, padded=np_ != n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, np_, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * (b * h) * np_ * np_ * d,
            bytes_accessed=3 * (b * h) * np_ * d * q.dtype.itemsize
            + (b * h) * np_ * d * q.dtype.itemsize,
            transcendentals=(b * h) * np_ * np_,
        ),
    )(qf, kf, vf)

    return _from_bh(out[:, :n], b, h), lse[:, :n]


def _bwd_masks(q_start, k_start, bq, bk, n):
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + q_start
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k_start
    return (row < n).astype(jnp.float32), (col < n)


def _p_block(q, k, lse, q_start, k_start, n, padded, prec):
    """Recompute the (bq, bk) probability block from saved lse (``q``
    pre-scaled, so no per-logit scale multiply); padded rows and columns
    are zeroed — compiled out when ``padded`` is False."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    p = jnp.exp(s - lse)
    if padded:
        row_mask, col_mask = _bwd_masks(
            q_start, k_start, q.shape[0], k.shape[0], n
        )
        p = jnp.where(col_mask, p * row_mask, 0.0)
    return p


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, n, padded):
    ki, qi = pl.program_id(1), pl.program_id(2)
    bq, bk = q_ref.shape[1], k_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # pre-scaled q'
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]      # (bq, 1) f32
    delta = delta_ref[0]  # (bq, 1) f32
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)

    p = _p_block(q, k, lse, qi * bq, ki * bk, n, padded, prec)  # (bq, bk)
    # dV += pᵀ dO
    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    # dU = p ∘ (dO Vᵀ − Δ)  — the gradient wrt the SCALED logits u = q'kᵀ;
    # no per-logit scale multiply anywhere in the backward either
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - delta)
    # dK += dUᵀ q'  (u = q'kᵀ, so ∂u/∂k carries the scale via q')
    dk_scr[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, n, padded):
    qi, ki = pl.program_id(1), pl.program_id(2)
    bq, bk = q_ref.shape[1], k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]  # pre-scaled q'
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)

    p = _p_block(q, k, lse, qi * bq, ki * bk, n, padded, prec)
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - delta)
    # accumulates dq' = dU k; the outer wrapper multiplies by scale once
    # (dq = scale · dU k, chain rule through q' = scale·q)
    dq_scr[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_backward(q, k, v, out, lse, g, block_q=BWD_BLOCK_Q,
                    block_k=BWD_BLOCK_K):
    b, n, h, d = q.shape
    block_q, block_k = _pick_blocks(n, block_q, block_k)
    scale = d ** -0.5

    # same pre-scaled q' the forward used (the saved lse is in q'k units)
    qf = _to_bh((q.astype(jnp.float32) * scale).astype(q.dtype))
    kf, vf = _to_bh(k), _to_bh(v)
    of, gf = _to_bh(out), _to_bh(g)
    # Δ = rowsum(dO ∘ O), fp32
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)

    np_ = n + ((-n) % max(block_q, block_k))
    if np_ != n:
        qf, kf, vf, gf = (_pad_n(x, np_) for x in (qf, kf, vf, gf))
        lse = _pad_n(lse, np_)
        delta = _pad_n(delta, np_)
    bh = b * h
    nq, nk = np_ // block_q, np_ // block_k

    qspec = pl.BlockSpec((1, block_q, d), lambda i, a, b_: (i, b_, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, d), lambda i, a, b_: (i, a, 0),
                         memory_space=pltpu.VMEM)
    r1q = pl.BlockSpec((1, block_q, 1), lambda i, a, b_: (i, b_, 0),
                       memory_space=pltpu.VMEM)
    padded = np_ != n
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n=n, padded=padded),
        grid=(bh, nk, nq),
        in_specs=[qspec, kspec, kspec, qspec, r1q, r1q],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, a, b_: (i, a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, a, b_: (i, a, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, np_, d), k.dtype),
            jax.ShapeDtypeStruct((bh, np_, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(qf, kf, vf, gf, lse, delta)

    qspec2 = pl.BlockSpec((1, block_q, d), lambda i, a, b_: (i, a, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, block_k, d), lambda i, a, b_: (i, b_, 0),
                          memory_space=pltpu.VMEM)
    r1q2 = pl.BlockSpec((1, block_q, 1), lambda i, a, b_: (i, a, 0),
                        memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n=n, padded=padded),
        grid=(bh, nq, nk),
        in_specs=[qspec2, kspec2, kspec2, qspec2, r1q2, r1q2],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, a, b_: (i, a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(qf, kf, vf, gf, lse, delta)

    # dq' -> dq: one (N, Dh) multiply, in fp32 before the output cast
    dq = (dq[:, :n].astype(jnp.float32) * scale).astype(q.dtype)
    return (_from_bh(dq, b, h), _from_bh(dk[:, :n], b, h),
            _from_bh(dv[:, :n], b, h))


@jax.custom_vjp
def flash_attention_pallas(q, k, v):
    """Flash attention on TPU. q, k, v: (B, N, H, Dh) → (B, N, H, Dh)."""
    return _flash_forward(q, k, v)


def _fwd(q, k, v):
    out, lse = _flash_forward_lse(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g)


flash_attention_pallas.defvjp(_fwd, _bwd)
