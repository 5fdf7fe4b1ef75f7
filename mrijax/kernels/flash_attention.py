"""Flash (memory-efficient) self-attention for the 3D latent bottleneck.

The reference materializes the full N×N attention matrix over N = D·H·W
tokens (`ddpm_3d_ldm/unet_attention.py:44-52`). At the flagship config the
block sits at the bottleneck (N = 800), where that is affordable — but the
quadratic wall is what forces the reference to keep attention at the lowest
resolution only. This kernel removes the wall (O(N·block) memory), enabling
attention at higher levels / full-latent resolution (N = 51 200+):

* ``impl="pallas"`` — a Pallas TPU kernel: online-softmax over KV blocks,
  O(N · block) memory, fp32 accumulators, logits on the MXU.
* ``impl="xla"``    — an exact chunked-query fallback in plain JAX (works on
  CPU for tests and as a safety net): scans over query chunks so only a
  (chunk × N) strip of logits is live at once.
* ``impl="auto"``   — pallas on TPU, xla elsewhere.

All implementations compute identical results (up to fp32 reduction order).
API: q, k, v of shape (B, N, H, Dh) → (B, N, H, Dh), scale = Dh**-0.5.
"""

import functools

import jax
import jax.numpy as jnp

from mrijax.ops.attention import multi_head_self_attention


def _pick_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    from mrijax.kernels.dispatch import pallas_enabled

    return "pallas" if pallas_enabled() else "xla"


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
    q_chunk: int = 1024,
) -> jnp.ndarray:
    """Memory-efficient attention. q, k, v: (B, N, H, Dh) → (B, N, H, Dh)."""
    impl = _pick_impl(impl)
    if impl == "pallas":
        from mrijax.kernels.flash_attention_pallas import flash_attention_pallas

        return flash_attention_pallas(q, k, v)
    if impl == "xla":
        return _chunked_attention_xla(q, k, v, q_chunk=q_chunk)
    raise ValueError(f"unknown flash attention impl {impl!r}")


@functools.partial(jax.jit, static_argnames=("q_chunk",))
def _chunked_attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, q_chunk: int = 1024
) -> jnp.ndarray:
    """Exact attention, scanning over query chunks (O(chunk·N) logits)."""
    b, n, h, d = q.shape
    if n <= q_chunk:
        return multi_head_self_attention(q, k, v)
    pad = (-n) % q_chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = q.shape[1] // q_chunk
    qc = q.reshape(b, nc, q_chunk, h, d).swapaxes(0, 1)  # (nc, B, chunk, H, Dh)

    def one_chunk(qi):
        return multi_head_self_attention(qi, k, v)

    out = jax.lax.map(one_chunk, qc)  # (nc, B, chunk, H, Dh)
    out = out.swapaxes(0, 1).reshape(b, nc * q_chunk, h, d)
    return out[:, :n]
