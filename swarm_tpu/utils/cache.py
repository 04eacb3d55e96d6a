"""Persistent XLA compilation cache (tunnelled-TPU remedy).

The environment's TPU backend compiles through a slow remote service
(minutes per fresh program; an aborted compile can wedge the tunnel for
~15 min). Enabling JAX's persistent compilation cache makes every
invocation after the first start in seconds. Harmless on CPU.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:      # pragma: no cover - older jax fallbacks
        pass
