"""Persistent XLA compile-cache setup.

This environment pre-imports jax from a sitecustomize hook, so setting
``JAX_COMPILATION_CACHE_DIR`` via ``os.environ`` inside a script is silently
ignored (jax's config already initialized). Configure through the config API
instead; every entry point (bench, scripts) calls :func:`enable`.
"""

from __future__ import annotations

import os


def enable(path: str | None = None,
           min_compile_secs: float = 0.5) -> str:
    """Point jax's persistent compile cache at ``path`` (default:
    ``<repo>/.cache/jax``). Safe to call repeatedly."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
