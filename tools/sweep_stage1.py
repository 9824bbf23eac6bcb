#!/usr/bin/env python3
"""Stage-1 quality sweep (round-5 VERDICT #5): train stage-1 teacher forcing
ONCE per data budget, then judge-eval the checkpoint on held-out val_unseen
at several stop thresholds — isolating the two suspected SR levers
(data budget, stop calibration) without re-training per point.

Usage:
  python tools/sweep_stage1.py --seed 0 --episodes 48 --epochs 10 \
      --thresholds 0.55,0.7,0.8 [--judge-n 60]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--thresholds", default="0.55,0.7,0.8")
    ap.add_argument("--judge-n", type=int, default=60)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tools.learning_check import tiny_config
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    tmp = tempfile.mkdtemp(prefix=f"sweep_s1_{args.seed}_{args.episodes}_")
    print(f"[sweep_stage1] workdir {tmp}")
    cfg = tiny_config(tmp, args.episodes, args.epochs)
    cfg.defrost()
    if args.seed:
        cfg.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET = args.seed
    if args.lr is not None:
        cfg.DAGGER.LR = args.lr
    cfg.freeze()

    trainer = DaggerTrainer(cfg, env_workers=False)
    metrics = trainer.train()
    print(f"[sweep_stage1] train final: {json.dumps(metrics, default=float)}")
    ckpt = ckpt_lib.latest_checkpoint(cfg.CHECKPOINT_FOLDER)
    assert ckpt

    rows = []
    for thr in [float(t) for t in args.thresholds.split(",")]:
        c = cfg.clone(); c.defrost()
        c.EVAL_CKPT_PATH_DIR = ckpt
        c.EVAL.SPLIT = "val_unseen"
        c.EVAL.EPISODE_COUNT = args.judge_n
        c.TASK_CONFIG.DATASET.FAKE_EPISODES = max(
            args.judge_n * 2, c.TASK_CONFIG.DATASET.FAKE_EPISODES)
        c.STOP_CONDITION.PROG_THRESHOLD = thr
        c.METRIC_DIR = os.path.join(tmp, f"judge_thr{thr}")
        c.freeze()
        agg = DaggerTrainer(c, env_workers=False).eval()
        rows.append((thr, agg))
        print(f"[sweep_stage1] thr={thr:.2f} "
              + " ".join(f"{k}={agg.get(k, float('nan')):.3f}"
                         for k in ("success", "distance_to_goal",
                                   "oracle_navigation_error", "oracle_success",
                                   "steps_taken", "path_length")))

    best = max(rows, key=lambda r: (r[1].get("success", 0),
                                    -r[1].get("oracle_navigation_error", 99)))
    print(json.dumps({
        "seed": args.seed, "episodes": args.episodes, "epochs": args.epochs,
        "ckpt": ckpt,
        "best_threshold": best[0],
        "best": best[1],
        "all": {f"{t:.2f}": a for t, a in rows},
    }, indent=2, default=float))


if __name__ == "__main__":
    main()
