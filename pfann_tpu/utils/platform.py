"""Backend selection + persistent-compilation-cache helper.

The sandboxed axon TPU plugin force-selects itself from sitecustomize via
``jax.config.update("jax_platforms", "axon,cpu")`` in *every* Python
process, clobbering the standard ``JAX_PLATFORMS`` env var.  CLIs call
:func:`apply_platform_override` first thing so tests/subprocesses can pin
the backend with ``PFANN_PLATFORM=cpu`` (or any valid jax_platforms
string).

The same hook can enable JAX's persistent compilation cache
(``PFANN_COMPILE_CACHE=<dir>``, opt-in): the CLIs are separate processes
per invocation (builder, 8x matcher in testall.sh), and re-jitting the
embedder + alignment engine each time costs tens of seconds to minutes —
the cache makes every invocation after the first start warm.  Opt-in
because XLA:CPU AOT reloads print machine-feature-mismatch warnings on
this sandbox (the cached code still runs; measured 2.2 s -> 0.4 s
recompile).
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    override = os.environ.get("PFANN_PLATFORM")
    cache_dir = os.environ.get("PFANN_COMPILE_CACHE")
    if not override and not cache_dir:
        return
    import jax

    if override:
        jax.config.update("jax_platforms", override)
    if cache_dir:
        try:
            jax.config.update(
                "jax_compilation_cache_dir", os.path.abspath(cache_dir)
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # older jax without the persistent cache knobs
