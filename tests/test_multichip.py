"""Multi-device sharding test: run dryrun_multichip on a virtual CPU mesh.

Runs in a subprocess with PYTHONPATH cleared so the axon TPU plugin does
not force-register and XLA exposes 8 virtual CPU devices (the same
mechanism the driver uses).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.parametrize("n_devices", [4])
def test_dryrun_multichip(n_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n_devices})"
    )
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "OK" in res.stdout
