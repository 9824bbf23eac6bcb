#!/usr/bin/env python3
"""Evaluate an existing learning-check checkpoint at several stop
thresholds (STOP_CONDITION.PROG_THRESHOLD) on the held-out judge split.

Separates the two stage-1 quality levers (VERDICT r4 #5): navigation
(does the agent get within SUCCESS_DISTANCE at all -> oracle_success)
vs stop calibration (does it stop there -> success), without retraining.

Usage:
  python tools/eval_thresholds.py --tmp /tmp/learncheck_XXXX \
      --ckpt ckpt/ckpt.9.pth --seed 7 --episodes 96 \
      --thresholds 0.40,0.47,0.55,0.65
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmp", required=True)
    ap.add_argument("--ckpt", required=True, help="relative to --tmp")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--episodes", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--thresholds", default="0.40,0.47,0.55,0.65")
    ap.add_argument("--split", default="val_unseen")
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tools.learning_check import tiny_config
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    rows = []
    for thr in [float(t) for t in args.thresholds.split(",")]:
        cfg = tiny_config(args.tmp, args.episodes, args.epochs)
        cfg.defrost()
        if args.seed:
            cfg.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET = args.seed
        cfg.EVAL_CKPT_PATH_DIR = os.path.join(args.tmp, args.ckpt)
        cfg.EVAL.SPLIT = args.split
        cfg.EVAL.EPISODE_COUNT = args.n
        cfg.TASK_CONFIG.DATASET.FAKE_EPISODES = max(
            args.n * 2, cfg.TASK_CONFIG.DATASET.FAKE_EPISODES)
        cfg.STOP_CONDITION.PROG_THRESHOLD = thr
        cfg.METRIC_DIR = os.path.join(args.tmp, f"thr_{thr}")
        cfg.freeze()
        agg = DaggerTrainer(cfg, env_workers=False).eval()
        rows.append({"threshold": thr, **agg})
        print(f"[eval_thresholds] thr={thr:.2f} "
              + " ".join(f"{k}={agg.get(k, float('nan')):.3f}"
                         for k in ("success", "spl", "oracle_success",
                                   "distance_to_goal",
                                   "oracle_navigation_error",
                                   "steps_taken", "path_length")),
              flush=True)
    print(json.dumps(rows, default=float))


if __name__ == "__main__":
    main()
