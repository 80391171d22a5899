import jax

from .exp import local_directory, find_max_epoch, model_identifier


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache (huge win on remote-compile backends)."""
    if path is None:
        import os
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
