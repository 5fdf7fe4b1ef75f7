"""Test configuration: run everything on 8 virtual CPU devices.

This is the TPU-native analog of "test multi-node without a cluster"
(SURVEY.md §4): the mesh/collective code paths are exercised on an
8-device XLA CPU topology; numerics tests run in fp32 on CPU.

Must set the env vars before jax initializes its backends.
"""

import os

# Force CPU: the session env points JAX at a (slow, single-chip) TPU tunnel
# via an 'axon' plugin that IGNORES the JAX_PLATFORMS env var (and racily
# falls back to CPU only when the tunnel is busy). The authoritative switch
# is jax.config.update("jax_platforms", ...) after import; XLA_FLAGS must
# still be set before the backend initializes for the 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
