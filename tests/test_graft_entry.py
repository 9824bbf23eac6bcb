"""The driver's external checks must stay green: dryrun_multichip has to
arrange its own virtual 8-device CPU mesh regardless of env/backend state
(reference capability: DDP over N GPUs, common_trainer.py:35-44)."""
import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env: dict) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
@pytest.mark.subprocess
def test_dryrun_multichip_forces_virtual_mesh():
    # Driver-like env: no JAX_PLATFORMS/XLA_FLAGS forcing. Keep the child
    # off the TPU relay by not touching jax before the call.
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)", env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "8-device dp step ok" in r.stdout


@pytest.mark.slow
@pytest.mark.subprocess
def test_dryrun_multichip_after_jax_initialized():
    # Even if the caller already initialized a jax backend (1 device), the
    # dryrun must rebuild an 8-device cpu platform.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "assert len(jax.devices()) == 1;"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)", env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "8-device dp step ok" in r.stdout
