#!/usr/bin/env python3
"""Diagnostic: per-decision waypoint/progress error of a trained checkpoint.

Replays eval episodes with the trained policy while logging, at every
decision step, the predicted waypoint vs the oracle waypoint sensor and the
predicted progress vs the oracle progress — the direct measure of how well
stage-1 imitation transferred to rollout (vs the aggregate SR which is
noise-dominated at learning-check scale).

Usage: python tools/diag_policy_probe.py CKPT [--episodes 8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--episodes", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from tools.learning_check import tiny_config
    import tempfile
    tmp = tempfile.mkdtemp(prefix="diag_probe_")
    cfg = tiny_config(tmp, args.episodes, 1)

    from ws_mgmap_tpu.env.vector_env import construct_envs
    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.train.rollout import RolloutEngine
    from ws_mgmap_tpu.train.trainer import DaggerTrainer, load_split

    trainer = DaggerTrainer(cfg, env_workers=False)
    variables = trainer.init_variables()
    variables, _ = ckpt_lib.restore_variables(variables, args.ckpt)

    dataset, gt = load_split(cfg, "val_seen")
    engine = RolloutEngine(trainer.policy, variables, cfg.NUM_PROCESSES)
    envs = construct_envs(cfg, dataset, gt, auto_reset_done=False,
                          workers=False)
    n0 = envs.num_envs
    engine.reset_state(n0)
    observations = envs.reset()
    batch = engine.batch_obs(observations)
    masks = np.zeros((n0, 1), np.float32)
    stats = {}
    count_step = 0
    actions = np.zeros((envs.num_envs, 2), np.float32)
    wp_err, prog_err, recs = [], [], []
    cos_sims = []

    while envs.num_envs > 0 and len(stats) < args.episodes:
        current = envs.current_episodes()
        if count_step % cfg.step_num == 0 and count_step >= 24:
            out = engine.act(batch, masks, deterministic=True)
            actions = np.asarray(out.action)
            pred_wp = np.tanh(actions)
            oracle_wp = np.stack([np.asarray(o["waypoint"], np.float32)[:2]
                                  for o in observations])
            oracle_prog = np.asarray(
                [float(np.asarray(o["progress"]).reshape(-1)[0])
                 for o in observations])
            pred_prog = engine.prog[:, 0]
            for i in range(envs.num_envs):
                e = float(np.linalg.norm(pred_wp[i] - oracle_wp[i]))
                wp_err.append(e)
                no, np_ = (np.linalg.norm(oracle_wp[i]),
                           np.linalg.norm(pred_wp[i]))
                if no > 1e-3 and np_ > 1e-3:
                    cos_sims.append(float(
                        np.dot(pred_wp[i], oracle_wp[i]) / (no * np_)))
                prog_err.append(float(pred_prog[i] - oracle_prog[i]))
                if count_step < 40 and i == 0:
                    recs.append({
                        "step": count_step,
                        "pred_wp": [round(float(x), 3) for x in pred_wp[i]],
                        "oracle_wp": [round(float(x), 3) for x in oracle_wp[i]],
                        "pred_prog": round(float(pred_prog[i]), 3),
                        "oracle_prog": round(float(oracle_prog[i]), 3)})
        else:
            engine.update_map(batch, masks)
        if count_step < 24:
            actions = np.stack([np.asarray(o["waypoint"], np.float32)[:2]
                                for o in observations])
        prog = engine.prog
        outputs = envs.step([
            {"action": actions[e],
             "prog": float(prog[e, 0]) if count_step >= 24 else -1,
             "epidsode_reset_flag": count_step == 0}
            for e in range(envs.num_envs)])
        observations = [o[0] for o in outputs]
        dones = [o[2] for o in outputs]
        infos = [o[3] for o in outputs]
        count_step += 1
        masks = np.array([[0.0] if d else [1.0] for d in dones], np.float32)
        for i in range(envs.num_envs):
            if dones[i]:
                stats[current[i].episode_id] = infos[i]
        if all(dones):
            envs.resume_all()
            observations = envs.reset()
            engine.reset_state(envs.num_envs)
            masks = np.zeros((envs.num_envs, 1), np.float32)
            count_step = 0
            actions = np.zeros((envs.num_envs, 2), np.float32)
        batch = engine.batch_obs(observations)
        nxt = envs.current_episodes()
        to_pause = [i for i in range(envs.num_envs)
                    if nxt[i].episode_id in stats]
        if to_pause:
            keep = [i for i in range(envs.num_envs) if i not in to_pause]
            for i in reversed(to_pause):
                envs.pause_at(i)
            engine.keep(keep)
            observations = [observations[i] for i in keep]
            masks = masks[keep]
            actions = actions[keep]
            batch = engine.batch_obs(observations) if keep else batch
            if envs.num_envs == 0:
                break
    envs.close()

    agg = {}
    for k in next(iter(stats.values())):
        vals = [s[k] for s in stats.values() if np.isfinite(s[k])]
        agg[k] = round(float(np.mean(vals)), 3) if vals else None
    print(json.dumps({
        "n_eps": len(stats),
        "n_decisions": len(wp_err),
        "wp_l2_mean": round(float(np.mean(wp_err)), 4),
        "wp_l2_p50": round(float(np.median(wp_err)), 4),
        "wp_cos_mean": round(float(np.mean(cos_sims)), 4) if cos_sims else None,
        "prog_err_mean": round(float(np.mean(prog_err)), 4),
        "prog_err_std": round(float(np.std(prog_err)), 4),
        "agg": agg,
        "first_episode_trace": recs,
    }, indent=2))


if __name__ == "__main__":
    main()
