"""Persistent XLA compilation cache.

The axon remote compiles cost ~45-70 s per program (CLAUDE.md); caching
compiled executables on disk makes every driver restart after the first
nearly compile-free. Safe no-op when the backend doesn't support
serializable executables.
"""
import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/mliis_tpu_xla")


def enable_persistent_compilation_cache(cache_dir: str = None) -> bool:
    """Enable jax's persistent compilation cache; returns success.

    TPU backends only: cached XLA:CPU AOT executables carry the compiling
    machine's feature set and can SIGILL when the remote compile helper and
    the host CPU differ (observed on the axon path)."""
    import jax

    try:
        if jax.default_backend() != "tpu":
            return False
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or DEFAULT_CACHE_DIR)
        # Cache everything that took meaningful compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 - unsupported backend/config -> no-op
        return False


import contextlib


@contextlib.contextmanager
def cpu_cache_scope():
    """Context manager: temporarily point the persistent cache at the
    host-fingerprinted CPU dir, restoring the previous config on exit.

    For host-CPU compiles inside a TPU session (e.g. the jitted one-program
    model init): the TPU cache dir must never hold XLA:CPU AOT executables
    because /root persists across rounds while the build machine (and its
    CPU feature set) changes — a stale CPU executable SIGILLs."""
    import jax
    saved = {name: getattr(jax.config, name) for name in
             ("jax_compilation_cache_dir",
              "jax_persistent_cache_min_compile_time_secs",
              "jax_persistent_cache_min_entry_size_bytes")}
    enable_cpu_compilation_cache()
    try:
        yield
    finally:
        for name, value in saved.items():
            try:
                jax.config.update(name, value)
            except Exception:  # noqa: BLE001 - restore is best-effort
                pass


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature set (XLA:CPU AOT executables are
    feature-set-specific; a stale cache from a different machine SIGILLs)."""
    import hashlib
    import platform
    bits = platform.machine() + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    bits += line
                    break
    except OSError:
        pass
    return hashlib.sha256(bits.encode()).hexdigest()[:12]


def enable_cpu_compilation_cache(cache_dir: str = None) -> bool:
    """Persistent compile cache for CPU backends (the test suite), keyed by
    a host-CPU fingerprint so executables never load on a machine with a
    different feature set. Cuts the compile-dominated suite wall-clock on
    warm re-runs."""
    import jax

    try:
        if cache_dir is None:
            cache_dir = os.path.expanduser(
                "~/.cache/mliis_tpu_xla_cpu_" + _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 - unsupported config -> no-op
        return False
