"""Backend selection helper.

The sandboxed axon TPU plugin force-selects itself from sitecustomize via
``jax.config.update("jax_platforms", "axon,cpu")`` in *every* Python
process, clobbering the standard ``JAX_PLATFORMS`` env var.  CLIs call
:func:`apply_platform_override` first thing so tests/subprocesses can pin
the backend with ``PFANN_PLATFORM=cpu`` (or any valid jax_platforms
string).
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    override = os.environ.get("PFANN_PLATFORM")
    if override:
        import jax

        jax.config.update("jax_platforms", override)
