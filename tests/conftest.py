"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths are tested the standard JAX way (SURVEY.md section 4):
force the host platform and fake 8 devices.  The sandbox's axon site hook
overrides the JAX_PLATFORMS env var, so we force the platform through
jax.config (which wins) after setting XLA_FLAGS (which must precede
backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
