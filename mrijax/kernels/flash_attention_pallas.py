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

Backward pass: gradients are computed by re-running the exact chunked-query
XLA attention under ``jax.vjp`` (memory-safe recompute). A fused Pallas
backward kernel is a planned optimization; the forward dominates sampling,
which is the headline benchmark.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, n, scale):
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
    ) * scale  # (BLOCK_Q, BLOCK_K)

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
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_forward(q, k, v, block_q=BLOCK_Q, block_k=BLOCK_K):
    b, n, h, d = q.shape
    block_q, block_k = _pick_blocks(n, block_q, block_k)
    scale = d ** -0.5
    # (B, N, H, Dh) -> (B*H, N, Dh)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    n_pad = (-n) % max(block_q, block_k)
    if n_pad:
        pad = ((0, 0), (0, n_pad), (0, 0))
        qf, kf, vf = (jnp.pad(x, pad) for x in (qf, kf, vf))
    np_ = qf.shape[1]
    grid = (b * h, np_ // block_q, np_ // block_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, n=n, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, d), q.dtype),
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

    out = out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out


@jax.custom_vjp
def flash_attention_pallas(q, k, v):
    """Flash attention on TPU. q, k, v: (B, N, H, Dh) → (B, N, H, Dh)."""
    return _flash_forward(q, k, v)


def _fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    from mrijax.kernels.flash_attention import _chunked_attention_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _chunked_attention_xla(a, b, c), q, k, v)
    return vjp(g)


flash_attention_pallas.defvjp(_fwd, _bwd)
