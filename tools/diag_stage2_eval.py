#!/usr/bin/env python3
"""Diagnose the two-stage DAgger effect: paired held-out re-evaluation.

Given a learning_check run's artifact dir (ckpt/ + ckpt_da/), re-evaluate
the stage-1 checkpoint and each stage-2 iteration checkpoint on a FRESH
split (val_unseen scenes the selection never saw) with more episodes, and
report paired per-episode deltas. Separates "DAgger genuinely does not
improve this testbed" from "the 30-episode val_seen gate is noise".

Usage: python tools/diag_stage2_eval.py /tmp/learncheck_XXXX [--episodes 60]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--episodes", type=int, default=60)
    ap.add_argument("--split", default="val_unseen")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tools.learning_check import tiny_config
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    cfg = tiny_config(args.run_dir, 48, 10)
    s1 = ckpt_lib.latest_checkpoint(os.path.join(args.run_dir, "ckpt"))
    da_dir = os.path.join(args.run_dir, "ckpt_da")
    da = sorted((os.path.join(da_dir, f) for f in os.listdir(da_dir)
                 if f.startswith("ckpt.")),
                key=lambda p: int(p.rsplit(".", 2)[-2]))
    per_it = 4
    da = [p for p in da if int(p.rsplit(".", 2)[-2]) % per_it == per_it - 1]
    candidates = {"s1": s1}
    for p in da:
        candidates[f"s2_it{int(p.rsplit('.', 2)[-2]) // per_it}"] = p

    per_ep = {}
    for name, ck in candidates.items():
        c = cfg.clone(); c.defrost()
        c.EVAL_CKPT_PATH_DIR = ck
        c.EVAL.SPLIT = args.split
        c.EVAL.EPISODE_COUNT = args.episodes
        c.TASK_CONFIG.DATASET.FAKE_EPISODES = max(
            args.episodes * 2, c.TASK_CONFIG.DATASET.FAKE_EPISODES)
        c.METRIC_DIR = os.path.join(args.run_dir, f"diag_metric_{name}")
        c.freeze()
        agg = DaggerTrainer(c, env_workers=False).eval()
        print(f"[diag] {name}: " + " ".join(
            f"{k}={v:.3f}" for k, v in sorted(agg.items())), flush=True)
        fn = [f for f in os.listdir(c.METRIC_DIR) if f.startswith("each_")][0]
        with open(os.path.join(c.METRIC_DIR, fn)) as f:
            per_ep[name] = json.load(f)

    base = per_ep["s1"]
    for name, stats in per_ep.items():
        if name == "s1":
            continue
        ids = sorted(set(base) & set(stats))
        d_err = np.array([stats[i]["oracle_navigation_error"]
                          - base[i]["oracle_navigation_error"] for i in ids])
        d_succ = np.array([stats[i]["success"] - base[i]["success"]
                           for i in ids])
        se = d_err.std(ddof=1) / max(np.sqrt(len(ids)), 1)
        print(f"[paired] {name} vs s1 (n={len(ids)}): "
              f"mean_err_delta={d_err.mean():+.3f} (se {se:.3f}, "
              f"t={d_err.mean()/se if se else 0:+.2f}), "
              f"err wins/losses={int((d_err < -1e-9).sum())}/"
              f"{int((d_err > 1e-9).sum())}, "
              f"succ_delta={d_succ.mean():+.3f}", flush=True)


if __name__ == "__main__":
    main()
