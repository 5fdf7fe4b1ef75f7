"""Multi-head self-attention over flattened spatial tokens (XLA path).

Math matches the reference's 3D bottleneck attention
(`ddpm_3d_ldm/unet_attention.py:28-56`): per-head ``softmax(qᵀk · scale) v``
with ``scale = head_dim ** -0.5``; q/k/v come from a 1×1×1 conv and the
output goes through a 1×1×1 projection with a residual add (those convs live
in the calling module).

This module is the XLA reference implementation — large batched matmuls that
map straight onto the MXU. ``mrijax.kernels.flash_attention`` provides the
Pallas flash (online-softmax, O(N) memory) kernel for the 51 200-token latent
bottleneck; both produce identical results within tolerance.
"""

import jax.numpy as jnp


def multi_head_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    precision=None,
) -> jnp.ndarray:
    """Attention over tokens. q, k, v: (B, N, H, Dh). Returns (B, N, H, Dh).

    Softmax is computed in float32 (bf16-safe) and the result cast back to
    the input dtype.
    """
    dtype = q.dtype
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # (B, H, N, M)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, precision=precision,
        preferred_element_type=jnp.float32,
    )
    attn = jnp.astype(
        jnp.exp(logits * scale - jnp.max(logits * scale, axis=-1, keepdims=True)),
        jnp.float32,
    )
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", attn.astype(dtype), v, precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)
