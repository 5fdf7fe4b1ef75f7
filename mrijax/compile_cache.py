"""Persistent XLA compile cache, tunnel-session-proof.

The reference has no compile step to cache (eager PyTorch); on TPU the
first compile of a big jitted program costs minutes, so mrijax ships a
one-call enabler wired into every CLI entry point (``--compile-cache`` /
``MRIJAX_COMPILE_CACHE``).

Why the key stabilization exists: remote-TPU worker pools (e.g. the axon
tunnel) rotate between sessions, and each worker's ``platform_version``
and serialized topology feed jax's cache key — so an identical computation
gets a NEW key whenever a session lands on a different worker build, and
the cache never hits across sessions. Hashing only the platform NAME keeps
the key correct-by-construction for a fixed jax install (the key still
contains the full computation, jaxlib version, XLA flags, and compile
options), and a stale executable from an incompatible worker build fails
DEserialization cleanly — jax then falls back to compilation and rewrites
the entry (``jax_raise_persistent_cache_errors`` stays False).
"""

import os
import sys
from typing import Optional

import jax


def enable_compile_cache(
    cache_dir: Optional[str] = None,
    *,
    stabilize_key: bool = True,
    min_compile_secs: float = 1.0,
) -> Optional[str]:
    """Enable the persistent compile cache at ``cache_dir`` (default: the
    ``MRIJAX_COMPILE_CACHE`` env var; no-op returning None when neither is
    set). Returns the directory in use."""
    if os.environ.get("MRIJAX_DISABLE_COMPILE_CACHE"):
        # Escape hatch: on a slow client<->worker link, SHIPPING a cached
        # multi-MB executable to the device can cost more than letting the
        # worker recompile from the ~250 KB HLO (measured on the axon
        # tunnel — PERF.md "Cold-setup anatomy"). This disables the client
        # cache without touching call sites.
        return None
    cache_dir = cache_dir or os.environ.get("MRIJAX_COMPILE_CACHE")
    if not cache_dir:
        return None
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    if stabilize_key:
        stabilize_cache_key()
    return str(cache_dir)


def stabilize_cache_key() -> bool:
    """Make the cache key independent of the worker build string and
    topology blob (see module docstring). Returns False when jax internals
    moved and the patch could not be applied — never raises."""
    try:
        from jax._src import cache_key as _ck

        # plain attribute assignment cannot fail, so verify the hooks we
        # are overriding actually exist in THIS jax version — otherwise a
        # jax rename would leave dead attributes while we report success
        for name in ("_hash_platform", "_hash_accelerator_config",
                     "_hash_string"):
            if not hasattr(_ck, name):
                raise AttributeError(f"jax._src.cache_key.{name} is gone")
        _ck._hash_platform = lambda h, backend: _ck._hash_string(
            h, backend.platform
        )
        _ck._hash_accelerator_config = lambda h, accs: None
        jax.config.update("jax_raise_persistent_cache_errors", False)
        return True
    except Exception as e:  # pragma: no cover - depends on jax internals
        print(f"[mrijax] cache-key stabilization unavailable: {e}",
              file=sys.stderr)
        return False
