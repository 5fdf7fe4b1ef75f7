"""Pallas TPU kernel: fused GroupNorm + SiLU over channels-last activations.

GroupNorm on (B, N, C) (N = flattened spatial) is bandwidth-bound: XLA
executes it as a stats reduction pass plus a normalize pass plus the SiLU,
reading the activation from HBM multiple times. This kernel does exactly
2 reads + 1 write:

* stats kernel  — grid (B, N/block): per-block column sums/sumsq reduced to
  per-group partials with a one-hot (C, G) matmul (MXU-friendly; avoids
  lane-splitting reshapes Mosaic can't tile), accumulated in VMEM scratch,
  written once per batch row;
* apply kernel  — grid (B, N/block): broadcast group stats back to channels
  with the transposed one-hot matmul, then (x−μ)·rsqrt(σ²+ε)·γ+β and SiLU
  fused in registers.

Differentiation dispatch: under ``jax.grad``/``vjp`` the ``custom_vjp``
FWD RULE runs — and it deliberately executes the XLA reference
implementation (`mrijax.ops.norms.group_norm_silu`) instead of the Pallas
kernel, with the backward as a plain ``jax.vjp`` through the same XLA fn.
XLA then sees one ordinary differentiable GN+SiLU graph and fuses
fwd+bwd optimally; the earlier design (Pallas forward + XLA recompute in
the backward) paid one extra full activation read per train step and
measured ~6% SLOWER than plain XLA on the 2D train step (PERF.md "Known
micro-headroom", now closed). Undifferentiated calls — sampling, serving,
the frozen-VAE encode — still run the fused Pallas primal body, where the
2-read/1-write fusion is a strict win. Tail N-blocks are masked. fp32
statistics regardless of input dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STATS_PAD = 128  # lane-width padding for the (2, G) stats row


def _onehot_cg(c: int, groups: int, dtype=jnp.float32):
    """(C, G) matrix with 1 where channel belongs to group."""
    cpg = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // cpg == g).astype(dtype)


def _stats_kernel(x_ref, out_ref, acc, *, n, block_n, groups):
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[0].astype(jnp.float32)  # (block_n, C)
    c = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0) + nb * block_n
    mask = (row < n).astype(jnp.float32)
    xm = x * mask
    onehot = _onehot_cg(c, groups)
    colsum = jnp.sum(xm, axis=0, keepdims=True)          # (1, C)
    colsumsq = jnp.sum(xm * xm, axis=0, keepdims=True)   # (1, C)
    # precision=HIGHEST: the MXU's default f32 path rounds operands to
    # bf16, which corrupts the variance statistics (measured 3.7e-2 output
    # error on hardware); fp32 statistics require the full-precision pass.
    gsum = jax.lax.dot_general(
        colsum, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, G)
    gsumsq = jax.lax.dot_general(
        colsumsq, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc[0:1, 0:groups] += gsum
    acc[1:2, 0:groups] += gsumsq

    @pl.when(nb == pl.num_programs(1) - 1)
    def _finalize():
        out_ref[0] = acc[:]


def _apply_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref,
                  *, n, block_n, groups, eps):
    x = x_ref[0].astype(jnp.float32)  # (block_n, C)
    c = x.shape[-1]
    cpg = c // groups
    count = jnp.float32(n * cpg)
    gsum = stats_ref[0, 0:1, 0:groups]      # (1, G)
    gsumsq = stats_ref[0, 1:2, 0:groups]
    mean_g = gsum / count
    var_g = gsumsq / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)      # (1, G)
    onehot_t = _onehot_cg(c, groups).T      # (G, C)
    mean_c = jax.lax.dot_general(
        mean_g, onehot_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, onehot_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scale = scale_ref[0:1, :].astype(jnp.float32)
    bias = bias_ref[0:1, :].astype(jnp.float32)
    y = (x - mean_c) * inv_c * scale + bias
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "block_n"))
def _forward(x3, scale, bias, groups: int, eps: float, block_n: int):
    b, n, c = x3.shape
    n_pad = (-n) % block_n
    xp = jnp.pad(x3, ((0, 0), (0, n_pad), (0, 0))) if n_pad else x3
    np_ = xp.shape[1]
    nb = np_ // block_n

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, n=n, block_n=block_n, groups=groups),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, STATS_PAD), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, STATS_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, STATS_PAD), jnp.float32)],
    )(xp)

    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, n=n, block_n=block_n, groups=groups,
                          eps=eps),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, STATS_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x3.dtype),
    )(xp, stats, scale2, bias2)
    return out[:, :n] if n_pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_silu_pallas(x, scale, bias, groups: int = 8, eps: float = 1e-5):
    """Fused GroupNorm+SiLU on (B, *spatial, C) channels-last input."""
    shape = x.shape
    x3 = x.reshape(shape[0], -1, shape[-1])
    out = _forward(x3, scale, bias, groups, eps, _pick_block(x3.shape[1]))
    return out.reshape(shape)


def _pick_block(n: int) -> int:
    for cand in (2048, 1024, 512, 256, 128):
        if n >= cand:
            return cand
    return 8 * ((n + 7) // 8)


def _fwd(x, scale, bias, groups, eps):
    # Differentiation dispatch (see module docstring): when this op is
    # being differentiated, run the XLA reference forward so the whole
    # fwd+bwd is one XLA-fused GN graph — the Pallas forward here would
    # only add an extra activation read on top of the backward's
    # recompute. Primal (no-grad) calls never reach this rule and keep
    # the fused Pallas kernel.
    from mrijax.ops.norms import group_norm_silu

    return group_norm_silu(x, groups, scale, bias, eps), (x, scale, bias)


def _bwd(groups, eps, res, g):
    from mrijax.ops.norms import group_norm_silu

    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu(xx, groups, ss, bb, eps),
        x, scale, bias,
    )
    return vjp(g)


group_norm_silu_pallas.defvjp(_fwd, _bwd)
