"""Persistent XLA compilation cache (safe no-op where unsupported).

Remote/TPU compiles of the big jitted programs take 30s-4min; caching under
/tmp lets repeat CLI invocations skip them. Called by every CLI main.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    import sys

    import jax

    # escape hatch for CPU smoke runs / sweep subprocesses in environments
    # whose sitecustomize pre-selects an accelerator platform (the plain
    # JAX_PLATFORMS env var is consumed before we run; the live config
    # still wins as long as no computation has executed). Every CLI calls
    # this helper first, so the protocol harnesses can drive ANY entry
    # point on CPU, not just cli.train.
    if os.environ.get("DPR_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DPR_FORCE_PLATFORM"])

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
