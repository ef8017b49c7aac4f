"""Multi-device sharding tests: dryrun_multichip on a virtual CPU mesh.

Two paths are covered:

1. self-defending: ``dryrun_multichip`` called from THIS process (which has
   the axon TPU plugin force-registered via PYTHONPATH) must re-exec itself
   in a subprocess with ``PYTHONPATH=<repo> JAX_PLATFORMS=cpu
   XLA_FLAGS=--xla_force_host_platform_device_count=N`` — the exact call
   the driver makes (VERDICT r1 item 1; MULTICHIP_r01 failed rc=1 because
   the old version ran inline on the TPU client).
2. pre-arranged env: a caller that already set up the CPU mesh env gets the
   inline path (no double subprocess).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_self_defending():
    """Driver-equivalent call: in-process, axon env intact, n=8."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    # must not raise; internally re-execs with the CPU-mesh env
    g.dryrun_multichip(8)


@pytest.mark.parametrize("n_devices", [4])
def test_dryrun_multichip_prearranged_env(n_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    code = (
        "import __graft_entry__ as g; "
        f"assert g._cpu_mesh_env_ok({n_devices}), 'env check broken'; "
        f"g.dryrun_multichip({n_devices})"
    )
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "OK" in res.stdout
