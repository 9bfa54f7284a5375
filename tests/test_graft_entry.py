"""The driver-facing multichip dryrun must survive a hostile
environment: conftest.py pins THIS process to a CPU mesh, but the
driver runs ``__graft_entry__.dryrun_multichip`` in its own process
where an accelerator plugin (the axon TPU tunnel) force-registers
itself and may be outright broken (round-2 gate failure: libtpu skew
inside device_put, VERDICT.md weak #1).  These tests spawn fresh
subprocesses WITHOUT the conftest pin -- the plugin is active exactly
as in the driver -- and require the dryrun to certify that no array
ever left the CPU."""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, extra_env=None):
    env = dict(os.environ)
    # the conftest-injected force flag must not leak: the driver's
    # process may or may not carry it and the dryrun must work either
    # way -- this variant removes it
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Driver shape: fresh process, no env hints, plugin active."""
    r = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "all arrays on cpu" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    """Worst case: jax backends already initialized before the call
    (pinning impossible in-process) -- must re-exec and still pass."""
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()\n"  # 1-device backend is now frozen
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "all arrays on cpu" in r.stdout
