"""End-to-end integration: collect -> train -> checkpoint -> eval on FakeSim.

Exercises the full DAgger pipeline (`dagger_trainer.py:543-678` equivalent)
with a reduced model + sensors so the whole loop runs on CPU in ~2 minutes.
"""
import os

import numpy as np
import pytest

import jax

from ws_mgmap_tpu.config.default import get_config


def tiny_config(tmp_dir: str):
    cfg = get_config()
    cfg.defrost()
    cfg.NUM_PROCESSES = 2
    cfg.DAGGER.ITERATIONS = 1
    cfg.DAGGER.EPOCHS = 1
    cfg.DAGGER.UPDATE_SIZE = 2
    cfg.DAGGER.BATCH_SIZE = 2
    cfg.DAGGER.P = 1.0
    cfg.DAGGER.LMDB_FEATURES_DIR = os.path.join(tmp_dir, "traj")
    cfg.CHECKPOINT_FOLDER = os.path.join(tmp_dir, "ckpt")
    cfg.TENSORBOARD_DIR = os.path.join(tmp_dir, "tb")
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.SPLIT = "val_seen"
    cfg.ep_max_len = 60
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 60
    cfg.TASK_CONFIG.DATASET.FAKE_EPISODES = 4
    cfg.TASK_CONFIG.DATASET.FAKE_SCENES = 2
    # shrink the perception stack: 64x64 rgb, small maps, thin policy
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = 64
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 64
    cfg.MODEL.RGBMAPPING.map_depth = 16
    cfg.MODEL.RGBMAPPING.global_map_size = 48
    cfg.MODEL.RGBMAPPING.egocentric_map_size = 20
    cfg.MODEL.MAP_ENCODER.ego_map_size = 20
    cfg.MODEL.MAP_ENCODER.output_size = 32
    cfg.MODEL.RGB_ENCODER.output_size = 32
    cfg.MODEL.DEPTH_ENCODER.output_size = 16
    cfg.MODEL.STATE_ENCODER.hidden_size = 64
    cfg.MODEL.INSTRUCTION_ENCODER.hidden_size = 16
    cfg.freeze()
    return cfg


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_full_dagger_pipeline(tmp_path):
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    cfg = tiny_config(str(tmp_path))
    trainer = DaggerTrainer(cfg, env_workers=False)
    metrics = trainer.train()
    assert metrics and np.isfinite(metrics["loss"])

    # checkpoint written in the torch format
    ckpts = os.listdir(cfg.CHECKPOINT_FOLDER)
    assert "ckpt.0.pth" in ckpts, ckpts

    # store has at least UPDATE_SIZE episodes
    from ws_mgmap_tpu.data.trajstore import TrajStoreReader
    assert len(TrajStoreReader(cfg.DAGGER.LMDB_FEATURES_DIR)) >= 2

    # eval runs the full rollout loop with the trained ckpt
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.EVAL_CKPT_PATH_DIR = cfg.CHECKPOINT_FOLDER
    cfg2.EVAL.POLL_IDLE_TIMEOUT = 1.0  # directory eval polls; bound it here
    cfg2.freeze()
    trainer2 = DaggerTrainer(cfg2, env_workers=False)
    agg = trainer2.eval()
    for k in ("success", "spl", "ndtw", "distance_to_goal", "steps_taken"):
        assert k in agg, agg
    assert np.isfinite(agg["steps_taken"]) and agg["steps_taken"] > 24


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_unique_episode_collection_terminates(tmp_path):
    """beta=1 collection must terminate cleanly when every env runs out of
    unique episodes before UPDATE_SIZE is reached (all-paused break)."""
    from ws_mgmap_tpu.data.trajstore import TrajStoreReader
    from ws_mgmap_tpu.train.collector import collect_dataset
    from ws_mgmap_tpu.train.rollout import RolloutEngine
    from ws_mgmap_tpu.train.trainer import DaggerTrainer, load_split

    cfg = tiny_config(str(tmp_path))
    cfg.defrost()
    cfg.DAGGER.UPDATE_SIZE = 10  # > the 4 unique fake episodes
    cfg.DAGGER.P = 1.0
    cfg.freeze()

    trainer = DaggerTrainer(cfg, env_workers=False)
    variables = trainer.init_variables()
    engine = RolloutEngine(trainer.policy, variables, cfg.NUM_PROCESSES)
    dataset, gt = load_split(cfg, cfg.TASK_CONFIG.DATASET.SPLIT)
    store = str(tmp_path / "traj_unique")
    collected = collect_dataset(cfg, engine, dataset, gt, store, 0,
                                workers=False)
    n = len(TrajStoreReader(store))
    assert 1 <= n <= 10
    assert collected == n
    # dedup log written
    assert (tmp_path / "traj_unique" / "collected_ep.txt").exists()
