"""Persistent XLA compilation cache (safe no-op where unsupported).

Remote/TPU compiles of the big jitted programs take 30s-4min; caching under
/tmp lets repeat CLI invocations skip them. Called by every CLI main.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    import sys

    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (OSError, AttributeError, ValueError) as e:
        # don't fail the CLI, but don't hide the regression either —
        # losing the cache costs minutes of recompiles per invocation
        print(
            f"warning: compilation cache disabled ({type(e).__name__}: {e})",
            file=sys.stderr,
        )
