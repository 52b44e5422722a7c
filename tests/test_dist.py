"""Multi-device sharding on a virtual 8-device CPU mesh (SURVEY.md §4.5).

Runs in a subprocess because --xla_force_host_platform_device_count must be
set before jax initializes (and slows every other test's compiles if set
globally — see conftest.py)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=480)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
    assert "16 upright" in out.stdout, out.stdout
