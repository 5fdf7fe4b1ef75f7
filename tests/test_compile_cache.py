"""Persistent compile cache enabler + session-proof key stabilization."""

import jax
import jax.numpy as jnp

from mrijax.compile_cache import enable_compile_cache, stabilize_cache_key


def test_enable_compile_cache_writes_entries(tmp_path, monkeypatch):
    monkeypatch.delenv("MRIJAX_COMPILE_CACHE", raising=False)
    assert enable_compile_cache(None) is None  # no dir, no env -> no-op

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        got = enable_compile_cache(str(tmp_path / "cc"), min_compile_secs=0.0)
        assert got == str(tmp_path / "cc")

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        _ = float(f(jnp.ones((64, 64))))
        entries = list((tmp_path / "cc").glob("*"))
        assert entries, "no persistent cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min
        )


def test_enable_compile_cache_env_var(tmp_path, monkeypatch):
    monkeypatch.setenv("MRIJAX_COMPILE_CACHE", str(tmp_path / "envcc"))
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compile_cache(None) == str(tmp_path / "envcc")
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)


def test_disable_env_var_wins(tmp_path, monkeypatch):
    """MRIJAX_DISABLE_COMPILE_CACHE=1 turns the cache off even when a dir
    is given explicitly AND via env — the escape hatch for slow
    client<->worker links where shipping a cached executable costs more
    than a worker-side recompile (PERF.md 'Cold-setup anatomy')."""
    monkeypatch.setenv("MRIJAX_COMPILE_CACHE", str(tmp_path / "envcc"))
    monkeypatch.setenv("MRIJAX_DISABLE_COMPILE_CACHE", "1")
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compile_cache(str(tmp_path / "cc")) is None
        assert jax.config.jax_compilation_cache_dir == old_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)


def test_stabilize_cache_key_patches_jax():
    """After stabilization the key hashes only the platform NAME — two
    fake backends differing only in build string produce the same hash."""
    import hashlib

    assert stabilize_cache_key()
    from jax._src import cache_key as ck

    class FakeBackend:
        platform = "tpu"

        def __init__(self, version):
            self.platform_version = version

    h1, h2 = hashlib.sha256(), hashlib.sha256()
    ck._hash_platform(h1, FakeBackend("axon 0.1.0; compat c49"))
    ck._hash_platform(h2, FakeBackend("axon 0.1.0; compat c50"))
    assert h1.hexdigest() == h2.hexdigest()
    # accelerator config (worker topology) no longer contributes
    h3 = hashlib.sha256()
    ck._hash_accelerator_config(h3, None)
    assert h3.hexdigest() == hashlib.sha256().hexdigest()


def test_disable_pallas_thread_accounting():
    """A thread's claim is released when ITS windows close, not when the
    global count reaches zero — otherwise the cross-thread trace warning
    misses the exact thread it exists to catch (r3 review finding)."""
    import threading

    from mrijax.kernels import dispatch

    inner_state = {}
    gate_a = threading.Event()
    gate_b = threading.Event()

    def thread_a():
        with dispatch.disable_pallas():
            with dispatch.disable_pallas():  # nested reentry
                pass
            inner_state["a_in"] = threading.get_ident() in dispatch._disabling_threads
        gate_a.set()
        gate_b.wait(5)
        inner_state["a_out"] = threading.get_ident() in dispatch._disabling_threads

    with dispatch.disable_pallas():  # main thread holds a window open
        t = threading.Thread(target=thread_a)
        t.start()
        gate_a.wait(5)
        # A's windows are closed; its ident must be gone even though the
        # global count is still nonzero (main's window)
        gate_b.set()
        t.join(5)
    assert inner_state["a_in"] is True
    assert inner_state["a_out"] is False
    assert threading.get_ident() not in dispatch._disabling_threads
    assert dispatch._disabled == 0


def test_cache_hits_across_processes(tmp_path):
    """The stabilized key must make a SECOND process reuse the first
    process's entries (the round-3 flagship fix): same computation + same
    cache dir -> no new cache files, and jax logs a persistent-cache hit."""
    import subprocess
    import sys

    prog = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import logging
logging.basicConfig(level=logging.DEBUG)
import jax, jax.numpy as jnp
# the env var is IGNORED by out-of-tree PJRT plugins (e.g. axon); the
# config update is the authoritative backend pin (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
from mrijax.compile_cache import enable_compile_cache
enable_compile_cache(sys.argv[1], min_compile_secs=0.0)
@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum()
print("val", float(f(jnp.ones((96, 96)))))
"""
    cc = tmp_path / "cc"
    env = {**__import__("os").environ}

    def run():
        return subprocess.run(
            [sys.executable, "-c", prog, str(cc)], env=env,
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    files1 = sorted(p.name for p in cc.glob("jit_f-*"))
    assert files1, "first run wrote no jit_f entry"
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    files2 = sorted(p.name for p in cc.glob("jit_f-*"))
    assert files2 == files1, f"second process minted a new key: {files2}"
    assert "Cache hit for key" in r2.stderr
