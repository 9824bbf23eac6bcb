"""Pytest wiring for the executable protocol scripts (VERDICT r2 #5/#7).

Each test shells out to the real tool exactly as a user would run it, so the
CLI surface (`run.py:24-70` equivalent), the real-format data layer, and the
parity protocol are exercised end-to-end, not via test-only shortcuts.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(script, args, timeout):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise AssertionError(
            f"{script} rc={r.returncode}\n--- stdout tail ---\n"
            f"{r.stdout[-3000:]}\n--- stderr tail ---\n{r.stderr[-3000:]}")
    return r.stdout


@pytest.mark.slow
@pytest.mark.subprocess
def test_cli_rehearsal_all_run_types(tmp_path):
    """train (stage 1 + stage 2) / eval / inference through the real CLI on
    real-format fixture data (reference surface `run.py:24-70`,
    `config/default.py:155-231`)."""
    out = _run_tool("cli_rehearsal.py",
                    ["--workdir", str(tmp_path), "--episodes", "3"],
                    timeout=3000)
    assert "CLI REHEARSAL: PASS" in out


def test_learning_check_config_initializes():
    """The learning check's reduced geometry must build a working policy:
    MapEncoder.output_hw(ego) has to be divisible by 4 or the MapDecoder's
    upsample-skip concat crashes (ego=48 -> 11 was committed broken in r3
    and cost an hour-long run to surface). Init the actual tiny_config
    model instead of trusting the arithmetic."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import learning_check

    from ws_mgmap_tpu.models.map_modules import MapEncoder
    cfg = learning_check.tiny_config("/tmp/_lc_cfgtest", 4, 1)
    ego = cfg.MODEL.MAP_ENCODER.ego_map_size
    assert MapEncoder.output_hw(ego) % 4 == 0, ego

    from ws_mgmap_tpu.train.trainer import DaggerTrainer
    trainer = DaggerTrainer(cfg, env_workers=False)
    variables = trainer.init_variables()
    assert "params" in variables


@pytest.mark.slow
@pytest.mark.subprocess
def test_parity_eval_fixture_mode():
    """Checkpoint round-trip + activation parity + FakeSim eval — the
    SR/SPL-parity protocol's dress rehearsal (BASELINE.md north star)."""
    out = _run_tool("parity_eval.py", ["--fixture"], timeout=1800)
    assert "PARITY FIXTURE: PASS" in out
