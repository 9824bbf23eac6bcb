"""Eval polling order/timeout, eval-failure escalation, and --run-type
inference (VERDICT r1 items #5/#7/#8 + missing #5)."""
import os

import numpy as np
import pytest

from tests.test_integration import tiny_config
from ws_mgmap_tpu.train.trainer import DaggerTrainer


def test_poll_order_is_index_ascending(tmp_path, monkeypatch):
    """`ckpt.10.pth` must be evaluated after `ckpt.2.pth`
    (reference polls in index order, common_trainer.py:210-226)."""
    cfg = tiny_config(str(tmp_path))
    folder = tmp_path / "ckpts"
    folder.mkdir()
    for i in (10, 2, 0):
        (folder / f"ckpt.{i}.pth").write_bytes(b"x")

    trainer = DaggerTrainer(cfg, env_workers=False)
    seen = []
    monkeypatch.setattr(trainer, "_eval_one",
                        lambda path: (seen.append(os.path.basename(path))
                                      or {"ok": 1.0}))
    out = trainer.eval(str(folder), idle_timeout_s=0.5)
    assert seen == ["ckpt.0.pth", "ckpt.2.pth", "ckpt.10.pth"]
    assert out == {"ok": 1.0}


def test_poll_picks_up_new_checkpoints(tmp_path, monkeypatch):
    cfg = tiny_config(str(tmp_path))
    folder = tmp_path / "ckpts"
    folder.mkdir()
    (folder / "ckpt.0.pth").write_bytes(b"x")

    trainer = DaggerTrainer(cfg, env_workers=False)
    seen = []

    def fake_eval(path):
        seen.append(os.path.basename(path))
        if len(seen) == 1:  # a new checkpoint appears while polling
            (folder / "ckpt.1.pth").write_bytes(b"x")
        return {"n": float(len(seen))}

    monkeypatch.setattr(trainer, "_eval_one", fake_eval)
    trainer.eval(str(folder), idle_timeout_s=0.5)
    assert seen == ["ckpt.0.pth", "ckpt.1.pth"]


def test_eval_while_training_reraises_on_repeat_failure(tmp_path, monkeypatch):
    cfg = tiny_config(str(tmp_path))
    trainer = DaggerTrainer(cfg, env_workers=False)

    def boom(*a, **k):
        raise RuntimeError("eval path broken")

    monkeypatch.setattr("ws_mgmap_tpu.train.trainer.load_split", boom)
    trainer._eval_while_training(state=None, tb=None, step=0)  # swallowed once
    with pytest.raises(RuntimeError, match="eval path broken"):
        trainer._eval_while_training(state=None, tb=None, step=1)


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_inference_covers_every_episode_once(tmp_path):
    """--run-type inference must dump one trajectory per dataset episode,
    terminating cleanly when env iterators cycle (2 env workers)."""
    cfg = tiny_config(str(tmp_path))
    cfg.defrost()
    cfg.INFERENCE.SPLIT = "val_seen"
    cfg.INFERENCE.PREDICTIONS_FILE = str(tmp_path / "predictions.json")
    cfg.EVAL.EPISODE_COUNT = 100  # more than available -> bounded by dataset
    cfg.freeze()

    trainer = DaggerTrainer(cfg, env_workers=False)
    out_path = trainer.inference()

    import json
    with open(out_path) as f:
        predictions = json.load(f)

    from ws_mgmap_tpu.train.trainer import load_split
    dataset, _ = load_split(cfg, "val_seen")
    want_ids = {ep.episode_id for ep in dataset.episodes}
    assert set(predictions.keys()) == {str(i) for i in want_ids} or \
        set(predictions.keys()) == want_ids, (set(predictions), want_ids)
    for ep_id, traj in predictions.items():
        assert len(traj) >= 25, (ep_id, len(traj))
        for stepinfo in traj[:2]:
            assert "position" in stepinfo and "stop" in stepinfo, stepinfo
