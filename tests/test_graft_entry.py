"""The driver's multichip dryrun must be self-bootstrapping.

Round-1 failure mode (MULTICHIP_r01.json): the driver ran
``__graft_entry__.dryrun_multichip(8)`` in a bare process — no
``XLA_FLAGS``, and the sandbox sitecustomize clobbers ``JAX_PLATFORMS``
— so the entry point saw 1 device.  These tests pin both scenarios.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inproc():
    """Backend already up with 8 virtual devices (conftest) — the dryrun
    must leave it alone and pass its song+offset assertions."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_bare_subprocess():
    """Exactly the driver's invocation: fresh process, no platform env."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PFANN_PLATFORM")
    }
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout
