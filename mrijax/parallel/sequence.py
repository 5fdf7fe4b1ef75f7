"""Sequence-parallel attention over the mesh (the scaling story).

The reference has no long-sequence parallelism (SURVEY.md §5) — it
*compresses* (VAE latents, one bottleneck attention). mrijax reproduces the
compression and adds the sharding axis the reference lacks: the bottleneck's
token axis (N = D·H·W = 51 200 at flagship latent resolution) can be sharded
over a ``model`` mesh axis:

* each device holds N/d query tokens;
* K/V are small (N × C = 51 200 × 128 ≈ 13 MB bf16), so one ``all_gather``
  over ICI per attention — not a ring — is the right collective at this
  scale: the gather is ~100× cheaper than the N²/d logits each device
  computes;
* the local attention core is the Pallas flash kernel (or the chunked XLA
  fallback on CPU).

Composable inside jit via ``shard_map``; gradients flow (all_gather
transposes to reduce-scatter automatically).
"""

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mrijax.kernels.flash_attention import flash_attention


def sequence_parallel_attention(
    q, k, v, *, mesh: Mesh, axis: str = "model", impl: str = "auto"
):
    """Multi-head attention with the token axis sharded over ``axis``.

    q, k, v: (B, N, H, Dh) global arrays; returns (B, N, H, Dh) sharded the
    same way. N must be divisible by the axis size.
    """
    n = q.shape[1]
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(f"token axis {n} not divisible by mesh axis {axis}={d}")

    def local_attn(ql, kl, vl):
        k_full = jax.lax.all_gather(kl, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(vl, axis, axis=1, tiled=True)
        return flash_attention(ql, k_full, v_full, impl=impl)

    spec = P(None, axis, None, None)
    return shard_map(
        local_attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
