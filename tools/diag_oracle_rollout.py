#!/usr/bin/env python3
"""Diagnostic: oracle upper bound for the FakeSim learning-check task.

Rolls out the EXACT eval protocol (24-step spin, decision every step_num,
GT follower toward the chosen waypoint) but with actions taken from the
oracle waypoint sensor and stop driven by the oracle progress sensor —
i.e. a policy that perfectly regresses its supervision targets. The
resulting success/oracle-error is the ceiling `tools/learning_check.py`
can approach; if THIS is low, the task/check is miscalibrated, not the
trainer (VERDICT r2 "what's missing" #2).

Usage: python tools/diag_oracle_rollout.py [--episodes 20] [--prog-th 0.8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--prog-th", type=float, default=0.8)
    ap.add_argument("--max-steps", type=int, default=90)
    ap.add_argument("--stop-mode", choices=["prog", "geodesic"],
                    default="prog",
                    help="prog: eval-style stop when oracle progress "
                    "exceeds --prog-th; geodesic: collection-style stop "
                    "(prog=-1, env stops at geodesic<0.5)")
    ap.add_argument("--seed", type=int, default=0,
                    help="independent FakeSim episode draw "
                    "(DATASET.FAKE_SEED_OFFSET), as learning_check --seed")
    ap.add_argument("--split", default="val_seen",
                    help="FakeSim split to roll out (e.g. val_unseen = the "
                    "learning-check judge split)")
    args = ap.parse_args()

    sys.argv = [sys.argv[0]]  # tiny_config import side effects
    from tools.learning_check import tiny_config
    import tempfile
    tmp = tempfile.mkdtemp(prefix="diag_oracle_")
    cfg = tiny_config(tmp, args.episodes, 1)
    cfg.defrost()
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = args.max_steps
    cfg.ep_max_len = args.max_steps
    if args.seed:
        cfg.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET = args.seed
    cfg.freeze()

    from ws_mgmap_tpu.env.vector_env import construct_envs
    from ws_mgmap_tpu.train.trainer import load_split

    dataset, gt = load_split(cfg, args.split)
    envs = construct_envs(cfg, dataset, gt, auto_reset_done=False,
                          workers=False)
    n0 = envs.num_envs
    observations = envs.reset()
    stats = {}
    count_step = 0
    trace = []
    while envs.num_envs > 0 and len(stats) < args.episodes:
        current = envs.current_episodes()
        actions = np.stack([
            np.arctanh(np.clip(np.asarray(o["waypoint"], np.float32)[:2],
                               -0.999, 0.999))
            for o in observations])
        progs = [float(np.asarray(o["progress"]).reshape(-1)[0])
                 for o in observations]
        if args.stop_mode == "geodesic":
            send_prog = [-1.0] * envs.num_envs
        else:
            send_prog = [p if count_step >= 24 else -1 for p in progs]
        outputs = envs.step([
            {"action": actions[e], "prog": send_prog[e],
             "epidsode_reset_flag": count_step == 0}
            for e in range(envs.num_envs)])
        observations = [o[0] for o in outputs]
        dones = [o[2] for o in outputs]
        infos = [o[3] for o in outputs]
        count_step += 1
        for i in range(envs.num_envs):
            if dones[i]:
                stats[current[i].episode_id] = infos[i]
                trace.append({"ep": current[i].episode_id,
                              "steps": infos[i].get("steps_taken"),
                              "prog_at_done": progs[i]})
        if all(dones):
            envs.resume_all()
            observations = envs.reset()
            count_step = 0
        nxt = envs.current_episodes()
        to_pause = [i for i in range(envs.num_envs)
                    if nxt[i].episode_id in stats]
        if to_pause:
            keep = [i for i in range(envs.num_envs) if i not in to_pause]
            for i in reversed(to_pause):
                envs.pause_at(i)
            observations = [observations[i] for i in keep]
            if envs.num_envs == 0:
                break
    envs.close()

    agg = {}
    if stats:
        for k in next(iter(stats.values())):
            vals = [s[k] for s in stats.values() if np.isfinite(s[k])]
            agg[k] = float(np.mean(vals)) if vals else float("nan")
    print(json.dumps({"n": len(stats), "stop_mode": args.stop_mode,
                      "agg": agg, "trace": trace}, indent=2, default=float))


if __name__ == "__main__":
    main()
