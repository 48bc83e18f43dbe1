"""Host-side utilities: timing/tracing, registries, serialization helpers."""

from .timing import PhaseTimer  # noqa: F401


def enable_compile_cache(repo_dir=None):
    """Point jax's persistent compilation cache at ``<repo>/.jax_cache``.

    One-liner shared by the benches/tests — recompiles of the big fused
    programs cost minutes through a remote-compile tunnel.
    """
    import os

    import jax

    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
