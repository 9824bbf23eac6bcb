#!/usr/bin/env python3
"""Multi-process data-parallel check (VERDICT r1 missing #4).

Modes (driven by tests/test_multiprocess.py):
  single <out.json>          1 process, 2 virtual CPU devices, 3 controlled
                             update steps -> loss history
  rank <r> <out.json>        one of 2 jax.distributed processes (1 CPU device
                             each) running the SAME global batch as `single`
                             from per-rank local halves; rank 0 dumps losses
  pipeline <r> <tmpdir>      full DaggerTrainer.train() under WORLD_SIZE=2:
                             rank-sharded FakeSim collection into per-rank
                             store shards + 2-process jitted dp training

The reference's equivalent is torch.distributed.launch + DDP/NCCL
(`run.py:24-70`, `common_trainer.py:35-44`).
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "localhost:12345"


def _force_cpu(n_local_devices: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def _controlled_setup():
    """Tiny policy + deterministic 4-episode batch (global)."""
    import numpy as np

    import jax.numpy as jnp

    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.train import step as step_lib
    from ws_mgmap_tpu.train.losses import MonitorConfig

    cfg = MGMapConfig(
        vocab_size=64, instr_hidden=16, rgb_output_size=32,
        depth_output_size=16, map_output_size=32, ego_map_size=20,
        hidden_size=64,
    )
    policy = BasePolicy(cfg)
    n, t, length = 4, 4, 8
    rng = np.random.RandomState(0)
    obs = {
        "instruction": rng.randint(1, 64, (n, t, length)).astype(np.int32),
        "rgb_features": rng.randn(n, t, 7, 7, 512).astype(np.float32) * 0.1,
        "depth_features": rng.randn(n, t, 4, 4, 128).astype(np.float32) * 0.1,
        "rgb_ego_map": rng.rand(n, t, 20, 20, 64).astype(np.float32),
        "waypoint": rng.uniform(-0.9, 0.9, (n, t, 2)).astype(np.float32),
        "progress": rng.rand(n, t, 1).astype(np.float32),
        "gt_path": (rng.rand(n, t, 20, 20) * 20).astype(np.float32),
        "gt_semantic_map": rng.randint(0, 27, (n, t, 20, 20)).astype(np.int32),
    }
    weights = np.ones((n, t), np.float32)
    masks = np.ones((n, t), np.float32)
    masks[:, 0] = 0.0
    batch = {"obs": obs, "weights": weights, "not_done_masks": masks}

    import jax

    variables = policy.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in obs.items()},
        jnp.zeros((2, n, cfg.hidden_size)), jnp.asarray(masks), True,
        method=BasePolicy.forward_seq)
    variables = jax.tree.map(np.asarray, variables)
    opt = step_lib.make_optimizer(1e-3)
    state = step_lib.create_train_state(variables, opt)
    update = step_lib.make_train_step(policy, opt, MonitorConfig(),
                                      cfg.hidden_size)
    return policy, state, update, batch


def _run_updates(state, update, batch, steps=3):
    import jax

    from ws_mgmap_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from ws_mgmap_tpu.train import step as step_lib

    mesh = make_mesh(dp=2)
    jit_update = step_lib.jit_train_step(update, mesh)
    state = replicate(mesh, state)
    losses = []
    for _ in range(steps):
        sbatch = shard_batch(mesh, batch)
        state, metrics = jit_update(state, sbatch)
        losses.append(float(metrics["loss"]))
    return losses


def mode_single(out_path: str):
    _force_cpu(2)
    _, state, update, batch = _controlled_setup()
    losses = _run_updates(state, update, batch)
    with open(out_path, "w") as f:
        json.dump({"losses": losses}, f)
    print("single:", losses, flush=True)


def mode_rank(rank: int, out_path: str):
    _force_cpu(1)
    import jax

    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and len(jax.devices()) == 2
    _, state, update, batch = _controlled_setup()
    # this rank's contiguous local half of the global batch
    local = jax.tree.map(lambda x: x[2 * rank: 2 * (rank + 1)], batch)
    losses = _run_updates(state, update, local)
    if rank == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses}, f)
    print(f"rank {rank}:", losses, flush=True)


def mode_pipeline(rank: int, tmpdir: str):
    _force_cpu(1)
    import jax

    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=2, process_id=rank)

    from tests.test_integration import tiny_config
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    cfg = tiny_config(tmpdir)
    cfg.defrost()
    cfg.NUM_PROCESSES = 1
    cfg.DAGGER.BATCH_SIZE = 1        # per-rank; global episode batch = 2
    cfg.DAGGER.UPDATE_SIZE = 2       # per-rank episodes collected
    cfg.TASK_CONFIG.DATASET.FAKE_EPISODES = 8
    cfg.freeze()

    trainer = DaggerTrainer(cfg, rank=rank, world_size=2, env_workers=False)
    metrics = trainer.train()
    assert metrics and all(
        abs(v) < 1e9 for v in metrics.values()), metrics
    with open(os.path.join(tmpdir, f"rank{rank}_done.json"), "w") as f:
        json.dump(metrics, f)
    print(f"pipeline rank {rank} done:", metrics, flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "single":
        mode_single(sys.argv[2])
    elif mode == "rank":
        mode_rank(int(sys.argv[2]), sys.argv[3])
    elif mode == "pipeline":
        mode_pipeline(int(sys.argv[2]), sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode}")
