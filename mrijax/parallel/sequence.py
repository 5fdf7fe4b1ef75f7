"""Sequence-parallel attention over the mesh (the scaling story).

The reference has no long-sequence parallelism (SURVEY.md §5) — it
*compresses* (VAE latents, one bottleneck attention). mrijax reproduces the
compression and adds the sharding axis the reference lacks: the bottleneck's
token axis (N = D·H·W = 51 200 at flagship latent resolution) is SPLIT over
a ``model`` mesh axis so each device computes N/d query rows of the N²
attention — the quadratic work divides by d while everything around the
bottleneck stays pure data parallelism.

Layout contract (load-bearing): activations enter and leave batch-sharded
over ``data`` and REPLICATED over ``model`` — the same layout every conv in
the network uses. The shard_map's in/out specs equal the ambient sharding,
so the partitioner never reshards across the attention boundary. The
earlier formulation (reshard to token-sharded ``P(data, model)`` at the
boundary) hit an XLA GSPMD miscompilation on jax 0.9.0: with a residual
fork around the attention, upstream parameter gradients came back scaled by
exactly the data-axis size (verified against finite differences;
regression-tested in tests/test_multidevice_equivalence.py).

Inside the body, each device

* slices ITS token chunk of q by ``axis_index`` (K/V are already local —
  no gather in the forward),
* runs the flash kernel (Pallas on TPU / chunked XLA elsewhere) on
  (N/d × N) scores,
* all_gathers output chunks over ``model`` (N·C bf16 ≈ 13 MB at flagship —
  ~100× cheaper than the N²/d logits each device computes).

The backward is an explicit custom_vjp shard_map (chunk VJP, all_gather dq
chunks, psum dK/dV over ``model``) rather than shard_map's automatic
transpose, for the same partitioner robustness reason.
"""

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mrijax.kernels.flash_attention import flash_attention


def sequence_parallel_attention(
    q, k, v, *, mesh: Mesh, axis: str = "model", impl: str = "auto",
    batch_axis: str = "data",
):
    """Multi-head attention with the token-axis WORK split over ``axis``.

    q, k, v: (B, N, H, Dh) arrays, batch-sharded over ``batch_axis`` (or
    replicated) and replicated over ``axis`` — the network's ambient layout.
    Returns (B, N, H, Dh) in the same layout. N must be divisible by the
    ``axis`` size.
    """
    n = q.shape[1]
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(f"token axis {n} not divisible by mesh axis {axis}={d}")
    chunk = n // d
    b_axis = (
        batch_axis
        if batch_axis in mesh.shape
        and mesh.shape[batch_axis] > 1
        and q.shape[0] % mesh.shape[batch_axis] == 0
        else None
    )
    # b_axis=None (batch replicated over the data axis) happens for
    # flax-init and odd-batch sampling, both forward-only: the inputs are
    # ambient-replicated there, so the specs still match the ambient layout
    # and no resharding occurs. Training batches are always divisible
    # (shard_batch enforces it), so the batch stays sharded over `data`.
    spec = P(b_axis, None, None, None)  # tokens full, replicated over `axis`

    def my_chunk(x):
        idx = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=1)

    def local_fwd(ql, kl, vl):
        out_chunk = flash_attention(my_chunk(ql), kl, vl, impl=impl)
        return jax.lax.all_gather(out_chunk, axis, axis=1, tiled=True)

    def local_bwd(ql, kl, vl, dol):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, impl=impl),
            my_chunk(ql), kl, vl,
        )
        dq_chunk, dk, dv = vjp(my_chunk(dol))
        dq = jax.lax.all_gather(dq_chunk, axis, axis=1, tiled=True)
        # every device computed dK/dV contributions from its query chunk
        dk = jax.lax.psum(dk, axis)
        dv = jax.lax.psum(dv, axis)
        return dq, dk, dv

    # check_vma=False: the checker cannot infer that a tiled all_gather over
    # `axis` leaves the result replicated across `axis` (it does, by
    # construction); gradients do not rely on the automatic transpose —
    # they are explicit in sp_attn_bwd.
    @jax.custom_vjp
    def sp_attn(q, k, v):
        return shard_map(
            local_fwd, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        )(q, k, v)

    def sp_attn_fwd(q, k, v):
        return sp_attn(q, k, v), (q, k, v)

    def sp_attn_bwd(res, do):
        q, k, v = res
        return shard_map(
            local_bwd, mesh=mesh, in_specs=(spec,) * 4,
            out_specs=(spec,) * 3, check_vma=False,
        )(q, k, v, do)

    sp_attn.defvjp(sp_attn_fwd, sp_attn_bwd)
    return sp_attn(q, k, v)
