"""Host-side utilities: timing/tracing, registries, serialization helpers."""

from .timing import PhaseTimer  # noqa: F401


def enable_compile_cache(repo_dir=None):
    """Point jax's persistent compilation cache at ``<repo>/.jax_cache``.

    One-liner shared by the benches/tests — recompiles of the big fused
    programs cost minutes through a remote-compile tunnel.  Also makes the
    cache's writes atomic (see :func:`_patch_atomic_cache_writes`) so a
    bench and the test suite can share the directory concurrently.
    """
    import os

    import jax

    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _patch_atomic_cache_writes()


def _patch_atomic_cache_writes():
    """Make jax's persistent-cache writes atomic (tmp file + ``os.replace``).

    jax 0.9's ``LRUCache.put`` writes cache entries IN PLACE
    (``cache_path.write_bytes(val)``, jax/_src/lru_cache.py:149) with no
    tmp+rename and — when eviction is disabled, the default — no lock.  A
    concurrent process reading the same key mid-write deserializes a torn
    executable and SEGFAULTS inside ``backend.deserialize_executable``
    (observed twice: full test suite sharing ``.jax_cache`` with a running
    bench).  Every entry point in this repo funnels through
    ``enable_compile_cache``, so patching here makes all our writers atomic;
    the reader then sees either the old-complete or new-complete file.
    """
    import os

    try:
        from jax._src import lru_cache as _lru
    except Exception:  # pragma: no cover - future jax refactor
        return
    if getattr(_lru.LRUCache.put, "_vican_atomic", False):
        return
    orig_put = _lru.LRUCache.put

    def put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        try:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if self.eviction_enabled:
                # size gate + lock + eviction semantics matter only with a
                # max_size configured; defer to the stock implementation
                # (its lock serializes writers, the race needs none).
                return orig_put(self, key, val)
            if cache_path.exists():
                return
            # tmp name must NOT end in _CACHE_SUFFIX (eviction globs on it)
            tmp = self.path / f"{key}.tmp{os.getpid()}"
            tmp.write_bytes(val)
            os.replace(str(tmp), str(cache_path))
        except Exception:  # pragma: no cover - e.g. non-local epath FS
            return orig_put(self, key, val)

    put._vican_atomic = True
    _lru.LRUCache.put = put
