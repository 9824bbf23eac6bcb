"""Trainer orchestration: DAgger training + checkpoint-folder evaluation.

Re-provides `CommonTrainer`/`DaggerTrainer`
(`vlnce_baselines/common_trainer.py:29-535`, `dagger_trainer.py:241-678`)
over the TPU stack: jitted data-parallel updates (train/step.py), device-
resident rollouts (train/rollout.py, train/collector.py), the native
trajectory store, torch-format checkpoints with auto-resume, and
TensorBoard logging.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ws_mgmap_tpu.env.dataset import (
    VLNCEDataset,
    fake_gt_locations,
    make_fake_dataset,
)
from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
from ws_mgmap_tpu.ops.mapping import init_global_map
from ws_mgmap_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ws_mgmap_tpu.train import checkpoint as ckpt_lib
from ws_mgmap_tpu.train import step as step_lib
from ws_mgmap_tpu.train.collector import collect_dataset
from ws_mgmap_tpu.train.evaluator import evaluate
from ws_mgmap_tpu.train.losses import MonitorConfig
from ws_mgmap_tpu.train.replay import ReplayLoader
from ws_mgmap_tpu.train.rollout import RolloutEngine
from ws_mgmap_tpu.utils.convert import import_torch_state, load_torch_checkpoint


def load_split(config, split: str):
    """Dataset + GT locations for a split; FakeSim data when the R2R_VLNCE
    files are absent."""
    import gzip
    import json
    import zlib

    path = config.TASK_CONFIG.DATASET.DATA_PATH.format(split=split)
    if os.path.exists(path):
        ds = VLNCEDataset.from_file(path)
        gt_path = config.TASK_CONFIG.TASK.NDTW.GT_PATH.format(split=split)
        gt = {}
        if os.path.exists(gt_path):
            with gzip.open(gt_path, "rt") as f:
                gt = json.load(f)
        return ds, gt
    n = config.TASK_CONFIG.DATASET.FAKE_EPISODES
    n_scenes = config.TASK_CONFIG.DATASET.FAKE_SCENES
    scenes = [f"fake/{split}_{i}" for i in range(n_scenes)]
    # zlib.crc32, not hash(): str hash is salted per process, which would
    # give every run — and every distributed RANK — a different episode
    # set for the same split
    ds = make_fake_dataset(
        num_episodes=n, scenes=scenes,
        seed=(zlib.crc32(split.encode())
              + config.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET) % 1000,
        min_geodesic=config.TASK_CONFIG.DATASET.FAKE_MIN_GEODESIC,
        max_geodesic=config.TASK_CONFIG.DATASET.FAKE_MAX_GEODESIC)
    return ds, fake_gt_locations(ds)


class DaggerTrainer:
    """`DaggerTrainer` (`dagger_trainer.py:241-678`)."""

    def __init__(self, config, rank: int = 0, world_size: int = 1,
                 env_workers: bool = True):
        self.config = config
        self.rank = rank
        self.world_size = world_size
        self.env_workers = env_workers
        self.model_cfg = MGMapConfig.from_config(config.MODEL)
        self.monitors = MonitorConfig.from_config(config.MODEL)
        self.policy = BasePolicy(self.model_cfg)
        self.store_dir = config.DAGGER.LMDB_FEATURES_DIR
        self.rollout_dtype = (jnp.bfloat16
                              if getattr(config.MODEL, "ROLLOUT_BF16", False)
                              else None)
        from ws_mgmap_tpu.parallel.mesh import best_dp
        # BATCH_SIZE is per-rank (like the reference's per-GPU batch,
        # `CMA_AUG.yaml:18`); the dp mesh spans the global episode batch
        self.mesh = make_mesh(dp=best_dp(config.DAGGER.BATCH_SIZE * world_size))
        # rollout (collection/eval) parallelism spans ALL local chips — the
        # TPU equivalent of the reference's per-GPU sim pools
        # (`env_utils.py:53-66`); RolloutEngine shards the env batch over it
        # and falls back per-batch when the size stops dividing
        self.rollout_mesh = make_mesh()
        self.writer = None

    # -- setup ---------------------------------------------------------------
    def init_variables(self, seed: int = 0, policy=None,
                       config=None) -> Dict[str, Any]:
        policy = policy or self.policy
        config = config or self.config
        c = policy.cfg
        sim = config.TASK_CONFIG.SIMULATOR
        obs = {
            "instruction": jnp.zeros((1, 200), jnp.int32),
            "rgb": jnp.zeros((1, sim.RGB_SENSOR.HEIGHT, sim.RGB_SENSOR.WIDTH, 3)),
            "depth": jnp.zeros(
                (1, sim.DEPTH_SENSOR.HEIGHT, sim.DEPTH_SENSOR.WIDTH, 1)),
            "gps": jnp.zeros((1, 2)),
            "compass": jnp.zeros((1, 1)),
        }
        variables = policy.init(
            jax.random.PRNGKey(seed), obs, jnp.zeros((2, 1, c.hidden_size)),
            jnp.zeros((1, 1)), init_global_map(1, c.mapper),
            method=BasePolicy.act,
        )
        variables = jax.tree.map(np.asarray, variables)
        variables = self._load_pretrained(variables)
        return variables

    def _load_pretrained(self, variables):
        """Frozen-trunk checkpoints (`unet_encoder.py:19-22`,
        `resnet_encoders.py:37-50`) + optional policy ckpt."""
        cfg = self.config
        unet_path = cfg.MODEL.RGB_ENCODER.pretrain_model
        if os.path.exists(unet_path):
            sd = load_torch_checkpoint(unet_path)
            sd = {f"net.rgb_encoder.base_model.{k}": v for k, v in sd.items()}
            variables, miss, _ = import_torch_state(variables, sd)
            self._log(f"loaded UNet weights from {unet_path}")
        else:
            # From-scratch path: the reference seeds UNet/MapDecoder with
            # ImageNet resnet18 (`unet_encoder.py:34`, `map_encoder.py:75`).
            imagenet = getattr(cfg.MODEL.RGB_ENCODER, "imagenet_resnet18", "")
            if imagenet and os.path.exists(imagenet):
                from ws_mgmap_tpu.utils.convert import import_imagenet_resnet18
                sd = load_torch_checkpoint(imagenet)
                variables, n = import_imagenet_resnet18(variables, sd)
                self._log(f"seeded UNet/MapDecoder backbones from ImageNet "
                          f"resnet18 ({imagenet}, {n} tensors)")
            else:
                import warnings
                warnings.warn(
                    "No UNet checkpoint and no ImageNet resnet18 weights "
                    f"found ({unet_path!r} / {imagenet!r}): the RGB segmenter "
                    "and map decoder start from RANDOM init. The reference "
                    "initializes these backbones from ImageNet "
                    "(unet_encoder.py:34); place a torchvision resnet18 "
                    "state_dict at MODEL.RGB_ENCODER.imagenet_resnet18 for "
                    "equivalent from-scratch statistics.", stacklevel=2)
        ddppo_path = cfg.MODEL.DEPTH_ENCODER.ddppo_checkpoint
        if os.path.exists(ddppo_path):
            raw = load_torch_checkpoint(ddppo_path)
            sd = {}
            for k, v in raw.items():
                parts = k.split(".")[2:]
                if parts and parts[0] == "visual_encoder":
                    sd["net.depth_encoder." + ".".join(parts)] = v
            variables, _, _ = import_torch_state(variables, sd)
            self._log(f"loaded DD-PPO depth weights from {ddppo_path}")
        emb_path = cfg.MODEL.INSTRUCTION_ENCODER.embedding_file
        if (cfg.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings
                and os.path.exists(emb_path)):
            from ws_mgmap_tpu.models.instruction_encoder import (
                load_pretrained_embeddings)
            emb = load_pretrained_embeddings(emb_path)
            tgt = variables["params"]["net"]["instruction_encoder"][
                "embedding_layer"]
            if tuple(emb.shape) == tuple(tgt["embedding"].shape):
                tgt["embedding"] = emb
                self._log(f"loaded instruction embeddings from {emb_path}")
        if cfg.DAGGER.LOAD_FROM_CKPT and os.path.exists(cfg.DAGGER.CKPT_TO_LOAD):
            variables, _ = ckpt_lib.restore_variables(
                variables, cfg.DAGGER.CKPT_TO_LOAD)
            self._log(f"loaded policy ckpt {cfg.DAGGER.CKPT_TO_LOAD}")
        return variables

    def _log(self, msg: str):
        if self.rank == 0:
            print(f"[trainer] {msg}", flush=True)

    def _tb(self):
        if self.writer is None and self.rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter
                os.makedirs(self.config.TENSORBOARD_DIR, exist_ok=True)
                self.writer = SummaryWriter(self.config.TENSORBOARD_DIR)
            except Exception:
                self.writer = False
        return self.writer or None

    # -- resume ---------------------------------------------------------------
    def resume(self, variables):
        """`resume_dagger` (`common_trainer.py:118-139`)."""
        folder = self.config.CHECKPOINT_FOLDER
        ckpt_file = self.config.RESUME_CKPT or ckpt_lib.latest_checkpoint(folder)
        if not ckpt_file:
            return variables, 0, 0
        variables, blob = ckpt_lib.restore_variables(variables, ckpt_file)
        d_it, epoch = ckpt_lib.parse_resume_point(
            blob, ckpt_file, self.config.DAGGER.EPOCHS)
        self._log(f"resumed from {ckpt_file} -> dagger_it={d_it} epoch={epoch}")
        return variables, d_it, epoch

    # -- train ---------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        cfg = self.config
        if self.rank == 0:
            os.makedirs(self.store_dir, exist_ok=True)
            os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)

        variables = self.init_variables()
        variables, start_it, start_epoch = self.resume(variables)

        optimizer = step_lib.make_optimizer(cfg.DAGGER.LR)
        state = step_lib.create_train_state(variables, optimizer)
        update = step_lib.make_train_step(
            self.policy, optimizer, self.monitors, self.model_cfg.hidden_size)
        jit_update = step_lib.jit_train_step(update, self.mesh)
        state = replicate(self.mesh, state)

        dataset, gt = load_split(cfg, cfg.TASK_CONFIG.DATASET.SPLIT)
        tb = self._tb()
        step_id = 0
        metrics: Dict[str, float] = {}

        for dagger_it in range(start_it, cfg.DAGGER.ITERATIONS):
            if not cfg.DAGGER.PRELOAD_LMDB_FEATURES:
                engine = RolloutEngine(
                    self.policy,
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)},
                    cfg.NUM_PROCESSES, compute_dtype=self.rollout_dtype,
                               mesh=self.rollout_mesh)
                collect_dataset(cfg, engine, dataset, gt, self.store_dir,
                                dagger_it, self.rank, self.world_size,
                                workers=self.env_workers, log_fn=self._log)
            if self.world_size > 1:
                # every rank's store shard must be complete before any rank
                # sizes its loader (the reference's barrier at
                # `dagger_trainer.py:345,551`)
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(f"collect_{dagger_it}")

            loader = ReplayLoader(
                self.store_dir, cfg.DAGGER.BATCH_SIZE, rank=self.rank,
                world_size=self.world_size, max_len=cfg.ep_max_len,
                seed=dagger_it, fixed_len=self.world_size > 1)
            for epoch in range(start_epoch, cfg.DAGGER.EPOCHS):
                t0 = time.time()
                n_batches = 0
                for batch in loader:
                    sbatch = shard_batch(self.mesh, {
                        "obs": batch["obs"],
                        "weights": batch["weights"],
                        "not_done_masks": batch["not_done_masks"],
                    })
                    state, metrics = jit_update(state, sbatch)
                    n_batches += 1
                    step_id += 1
                    if tb and step_id % cfg.LOG_INTERVAL == 0:
                        for k in ("loss", "action_loss", "aux_loss"):
                            tb.add_scalar(
                                f"train_{k}_iter_{dagger_it}",
                                float(metrics[k]), step_id)
                metrics = {k: float(v) for k, v in metrics.items()} if metrics else {}
                self._log(
                    f"dagger_it {dagger_it} epoch {epoch}: {n_batches} batches "
                    f"in {time.time()-t0:.1f}s " +
                    " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
                if self.rank == 0:
                    idx = dagger_it * cfg.DAGGER.EPOCHS + epoch
                    ckpt_lib.save_checkpoint(
                        os.path.join(cfg.CHECKPOINT_FOLDER, f"ckpt.{idx}.pth"),
                        {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)},
                        config=cfg,
                        extra_state={"dagger_it": dagger_it},
                    )
                # long stage-1 runs eval every 3rd epoch
                # (`dagger_trainer.py:644-655`)
                if (cfg.DAGGER.EPOCHS > 10 and epoch % 3 == 0
                        and self.rank == 0):
                    self._eval_while_training(state, tb, step=epoch)
            # end-of-iteration eval (`dagger_trainer.py:660-666`)
            if self.rank == 0 and cfg.DAGGER.ITERATIONS > 1:
                self._eval_while_training(state, tb, step=dagger_it)
            start_epoch = 0
        return metrics

    def _eval_while_training(self, state, tb, step: int) -> None:
        """Rollout eval on the reduced validation split during training
        (`dagger_trainer.py:644-666`, `common_trainer.py:269-271`)."""
        cfg = self.config
        eval_cfg = cfg.clone()
        eval_cfg.defrost()
        eval_cfg.TASK_CONFIG.DATASET.SPLIT = "val_unseen_min"
        eval_cfg.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        eval_cfg.NUM_PROCESSES = min(cfg.NUM_PROCESSES, 4)
        eval_cfg.freeze()
        try:
            dataset, gt = load_split(eval_cfg, "val_unseen_min")
            engine = RolloutEngine(
                self.policy,
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
                eval_cfg.NUM_PROCESSES, compute_dtype=self.rollout_dtype,
                               mesh=self.rollout_mesh)
            agg = evaluate(eval_cfg, engine, dataset, gt,
                           episode_count=min(len(dataset.episodes), 8),
                           workers=self.env_workers, log_fn=self._log)
            if tb:
                for k, v in agg.items():
                    if np.isfinite(v):
                        tb.add_scalar(f"eval_while_training_{k}", v, step)
            self._eval_fail_streak = 0
        except Exception as e:
            # One transient failure (e.g. an env worker dying) must not kill
            # a long training run, but a broken eval path should not degrade
            # to a log line for 30 epochs: re-raise on repeat failures.
            self._eval_fail_streak = getattr(self, "_eval_fail_streak", 0) + 1
            self._log(f"eval-while-training failed "
                      f"({self._eval_fail_streak} consecutive): {e}")
            if self._eval_fail_streak >= 2:
                raise

    # -- inference (leaderboard) ----------------------------------------------
    def inference(self, checkpoint_path: Optional[str] = None) -> str:
        """Leaderboard trajectory dump. The reference stubs this out
        (`common_trainer.py:534-535`); we record the VLNCEInferenceEnv
        per-step info stream into INFERENCE.PREDICTIONS_FILE."""
        import json

        from ws_mgmap_tpu.env.environments import VLNCEInferenceEnv
        from ws_mgmap_tpu.env.vector_env import construct_envs

        cfg = self.config.clone()
        cfg.defrost()
        split = cfg.INFERENCE.SPLIT
        cfg.TASK_CONFIG.DATASET.SPLIT = split
        cfg.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        cfg.NUM_PROCESSES = max(1, self.config.NUM_PROCESSES)
        cfg.freeze()

        variables = self.init_variables()
        path = checkpoint_path or cfg.INFERENCE.CKPT_PATH
        if path and os.path.exists(path):
            variables, _ = ckpt_lib.restore_variables(variables, path)

        dataset, gt = load_split(cfg, split)
        engine = RolloutEngine(self.policy, variables, cfg.NUM_PROCESSES,
                               compute_dtype=self.rollout_dtype,
                               mesh=self.rollout_mesh)
        envs = construct_envs(cfg, dataset, gt, auto_reset_done=False,
                              workers=self.env_workers,
                              env_cls=VLNCEInferenceEnv)
        # Same episode-exhaustion protocol as the evaluator
        # (`common_trainer.py:412-476`): run until every episode is recorded
        # once, pausing envs whose iterator cycled to a seen episode — robust
        # to shuffling and to multiple env workers.
        predictions: Dict[str, Any] = {}
        total = min(len(dataset.episodes), cfg.EVAL.EPISODE_COUNT)
        engine.reset_state(envs.num_envs)
        obs = envs.reset()
        batch = engine.batch_obs(obs)
        masks = np.zeros((envs.num_envs, 1), np.float32)
        trajectories: List[list] = [[] for _ in range(envs.num_envs)]
        count_step = 0
        actions = np.zeros((envs.num_envs, 2), np.float32)
        while envs.num_envs > 0 and len(predictions) < total:
            current = envs.current_episodes()
            if count_step % cfg.step_num == 0 and count_step >= 24:
                out = engine.act(batch, masks)
                actions = np.asarray(out.action)
            else:
                engine.update_map(batch, masks)
            if count_step < 24:
                actions = np.stack([np.asarray(
                    o["waypoint"], np.float32)[:2] for o in obs])
            prog = engine.prog
            outputs = envs.step([{
                "action": actions[e],
                "prog": float(prog[e, 0]) if count_step >= 24 else -1,
                "epidsode_reset_flag": count_step == 0,
                "depth_img": obs[e]["depth"],
            } for e in range(envs.num_envs)])
            obs = [o[0] for o in outputs]
            dones = [o[2] for o in outputs]
            count_step += 1
            masks = np.array([[0.0] if d else [1.0] for d in dones],
                             np.float32)
            for i in range(envs.num_envs):
                trajectories[i].append(outputs[i][3])
                if dones[i]:
                    predictions[current[i].episode_id] = trajectories[i]
                    trajectories[i] = []
            if all(dones):
                envs.resume_all()
                obs = envs.reset()
                engine.reset_state(envs.num_envs)
                masks = np.zeros((envs.num_envs, 1), np.float32)
                trajectories = [[] for _ in range(envs.num_envs)]
                count_step = 0
                actions = np.zeros((envs.num_envs, 2), np.float32)
            batch = engine.batch_obs(obs)
            nxt = envs.current_episodes()
            to_pause = [i for i in range(envs.num_envs)
                        if nxt[i].episode_id in predictions]
            if to_pause:
                keep = [i for i in range(envs.num_envs) if i not in to_pause]
                for i in reversed(to_pause):
                    envs.pause_at(i)
                engine.keep(keep)
                obs = [obs[i] for i in keep]
                masks = masks[keep]
                actions = actions[keep]
                trajectories = [trajectories[i] for i in keep]
                batch = engine.batch_obs(obs) if keep else batch
        envs.close()
        out_path = cfg.INFERENCE.PREDICTIONS_FILE
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(predictions, f)
        self._log(f"wrote {len(predictions)} trajectories to {out_path}")
        return out_path

    # -- eval ---------------------------------------------------------------
    @staticmethod
    def _ckpt_order_key(fname: str):
        """Ascending checkpoint index (`ckpt.10.pth` after `ckpt.2.pth`),
        matching the reference's index-ordered polling
        (`common_trainer.py:210-226`); non-indexed names sort last by name."""
        import re
        m = re.search(r"ckpt\.(\d+)\.pth$", fname)
        return (0, int(m.group(1)), fname) if m else (1, 0, fname)

    def eval(self, checkpoint_path: Optional[str] = None,
             poll: Optional[bool] = None,
             idle_timeout_s: Optional[float] = None) -> Dict[str, float]:
        """Single-checkpoint eval, or poll-the-folder mode
        (`common_trainer.py:189-226`): a directory path polls for new
        checkpoints **indefinitely** (the production "train on rank 0,
        eval in a second job" workflow), evaluating in ascending ckpt
        index. ``idle_timeout_s`` bounds the idle wait (tests/CI); the
        default comes from EVAL.POLL_IDLE_TIMEOUT (-1 = forever)."""
        cfg = self.config
        path = checkpoint_path or cfg.EVAL_CKPT_PATH_DIR
        if poll is None:
            poll = os.path.isdir(path)
        if not poll or os.path.isfile(path):
            return self._eval_one(path)

        if idle_timeout_s is None:
            t = float(getattr(cfg.EVAL, "POLL_IDLE_TIMEOUT", -1.0))
            idle_timeout_s = None if t < 0 else t

        evaluated = set()
        last: Dict[str, float] = {}
        idle_since = time.time()
        while (idle_timeout_s is None
               or time.time() - idle_since < idle_timeout_s):
            candidates = sorted(
                (f for f in os.listdir(path)
                 if f.endswith(".pth") and f not in evaluated),
                key=self._ckpt_order_key)
            if not candidates:
                time.sleep(2)
                continue
            idle_since = time.time()
            for f in candidates:
                evaluated.add(f)
                last = self._eval_one(os.path.join(path, f))
        return last

    def _eval_one(self, path: Optional[str]) -> Dict[str, float]:
        cfg = self.config
        if path and os.path.isdir(path):
            path = ckpt_lib.latest_checkpoint(path)

        blob = None
        ckpt_index = 0
        if path and os.path.exists(path):
            blob = ckpt_lib.load_checkpoint(path)
            import re
            m = re.search(r"ckpt\.(\d+)\.pth$", path)
            ckpt_index = int(m.group(1)) if m else 0

        # EVAL.USE_CKPT_CONFIG: rebuild the experiment config from the
        # checkpoint (`common_trainer.py:245-248`)
        if (blob is not None and cfg.EVAL.USE_CKPT_CONFIG
                and isinstance(blob.get("config"), dict)):
            from ws_mgmap_tpu.utils.config import Config
            ck_cfg = Config(blob["config"])
            ck_cfg.EVAL = cfg.EVAL
            ck_cfg.EVAL_CKPT_PATH_DIR = cfg.EVAL_CKPT_PATH_DIR
            ck_cfg.NUM_PROCESSES = cfg.NUM_PROCESSES
            # eval-time runtime settings survive the swap — the reference's
            # _setup_eval_config re-merges the eval command's trailing opts
            # over the checkpoint config (habitat BaseRLTrainer), so e.g.
            # `--run-type eval ... VIDEO_OPTION "['disk']"` records videos
            # of a checkpoint trained without them
            for key in ("VIDEO_OPTION", "VIDEO_DIR", "VIDEO_NUM",
                        "METRIC_DIR", "random_agent"):
                if hasattr(cfg, key):
                    setattr(ck_cfg, key, getattr(cfg, key))
            opts = list(getattr(cfg, "CMD_TRAILING_OPTS", []) or [])
            if opts:
                try:
                    ck_cfg.merge_from_list(opts)
                except Exception:
                    pass  # opts may name keys absent from older ckpt configs
            cfg = ck_cfg

        split = cfg.EVAL.SPLIT
        eval_cfg = cfg.clone()
        eval_cfg.defrost()
        eval_cfg.TASK_CONFIG.DATASET.SPLIT = split
        eval_cfg.TASK_CONFIG.ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE = False
        eval_cfg.NUM_PROCESSES = min(cfg.NUM_PROCESSES, 11)
        # video evals add the semantic overlay sensor + collision overlays
        # (`common_trainer.py:272-277`)
        if eval_cfg.VIDEO_OPTION:
            sensors = list(eval_cfg.TASK_CONFIG.TASK.SENSORS)
            if "SEMANTIC_FILTER_SENSOR" not in sensors:
                sensors.append("SEMANTIC_FILTER_SENSOR")
            eval_cfg.TASK_CONFIG.TASK.SENSORS = sensors
            agent_sensors = list(eval_cfg.TASK_CONFIG.SIMULATOR.AGENT_0.SENSORS)
            if "SEMANTIC_SENSOR" not in agent_sensors:
                agent_sensors.append("SEMANTIC_SENSOR")
            eval_cfg.TASK_CONFIG.SIMULATOR.AGENT_0.SENSORS = agent_sensors
        eval_cfg.freeze()

        # the checkpoint's config may describe a different model size; build
        # the policy for it (`common_trainer.py:289` rebuilds per-eval too)
        model_cfg = MGMapConfig.from_config(eval_cfg.MODEL)
        policy = self.policy if model_cfg == self.model_cfg else BasePolicy(model_cfg)
        variables = self.init_variables(policy=policy, config=eval_cfg)
        # random_agent: evaluate the untrained policy (`run.py` flag,
        # `common_trainer.py:289` passes not random_agent as load flag)
        if blob is not None and not self.config.random_agent:
            from ws_mgmap_tpu.utils.convert import import_torch_state
            variables, _, _ = import_torch_state(variables, blob["state_dict"])
            self._log(f"evaluating {path}")

        dataset, gt = load_split(eval_cfg, split)
        engine = RolloutEngine(policy, variables, eval_cfg.NUM_PROCESSES,
                               compute_dtype=self.rollout_dtype,
                               mesh=self.rollout_mesh)
        metric_dir = getattr(self.config, "METRIC_DIR", None)
        return evaluate(
            eval_cfg, engine, dataset, gt,
            episode_count=cfg.EVAL.EPISODE_COUNT,
            workers=self.env_workers, log_fn=self._log,
            metric_dir=metric_dir, checkpoint_index=ckpt_index, split=split,
            tb_writer=self._tb())
