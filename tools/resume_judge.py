#!/usr/bin/env python3
"""Resume an interrupted two-stage learning check at the judge phase.

`tools/learning_check.py --two-stage` ends with two paired 60-episode
val_unseen judge evals (stage-1 ckpt vs the selected stage-2 ckpt). If the
process dies between them, everything needed to finish is still on disk:
the checkpoints, the stage-1 judge metrics (`judge_s1/each_*.json`), and
the tee'd log with the selection evals. This tool re-runs ONLY the missing
stage-2 judge eval from the preserved workdir, recomputes the exact verdict
from `learning_check.py:281-310`, and appends a clearly-marked resume
section to the same log so the committed artifact is a complete record.

Usage:
  python tools/resume_judge.py --tmp /tmp/learncheck_XXXX --seed 7 \
      --episodes 96 --best-ckpt ckpt.7.pth \
      --log logs/learncheck_seed7_ep96_twostage.log
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_log(path):
    """Pull the verdict inputs that already ran out of the tee'd log."""
    eval_re = re.compile(r"\[trainer\] \[eval\] (\d+) episodes: (.*)")
    epoch_re = re.compile(r"\[trainer\] dagger_it (\d+) epoch (\d+): .*? (action_loss=.*)")
    loading_re = re.compile(r"\[trainer\] evaluating (\S+)")
    evals = []  # (n_episodes, metrics, preceding 'evaluating' path or None)
    epochs = []
    pending_path = None
    for line in open(path):
        m = loading_re.search(line)
        if m:
            pending_path = m.group(1)
            continue
        m = eval_re.search(line)
        if m:
            metrics = {k: float(v) for k, v in
                       (kv.split("=") for kv in m.group(2).split(", "))}
            evals.append((int(m.group(1)), metrics, pending_path))
            pending_path = None
            continue
        m = epoch_re.search(line)
        if m:
            metrics = {k: float(v) for k, v in
                       (kv.split("=") for kv in m.group(3).split(" "))}
            epochs.append((int(m.group(1)), int(m.group(2)), metrics))
    return evals, epochs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmp", required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--episodes", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--best-ckpt", required=True,
                    help="stage-2 checkpoint the selection evals picked")
    ap.add_argument("--log", required=True)
    ap.add_argument("--prog-threshold", type=float, default=None,
                    help="must match the interrupted run's --prog-threshold")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    evals, epochs = parse_log(args.log)
    # untrained baseline = first 30-episode eval with no ckpt load
    base = next(m for n, m, p in evals if n == 30 and p is None)
    # trained stage-1 eval = first eval after loading the stage-1 ckpt
    trained = next(m for n, m, p in evals
                   if n == 30 and p and "/ckpt/ckpt." in p)
    # stage-1 final train metrics = last epoch of the stage-1 iteration 0
    # (the first contiguous run of dagger_it 0 lines before stage 2 resets)
    s1_epochs = []
    for it, ep, m in epochs:
        if it == 0 and ep == len(s1_epochs):
            s1_epochs.append(m)
        elif s1_epochs and it == 0 and ep == 0:
            break  # stage 2 restarted iteration numbering
    metrics = s1_epochs[-1]
    # stage-1 judge eval = the 60-episode eval of the stage-1 ckpt
    s1_judge = next(m for n, m, p in evals
                    if n == 60 and p and "/ckpt/ckpt." in p)

    print(f"[resume_judge] resuming interrupted run in {args.tmp}: "
          f"stage-2 judge eval of {args.best_ckpt} on val_unseen x60")
    print(f"[resume_judge] parsed from log: base_onav="
          f"{base['oracle_navigation_error']:.3f} "
          f"s1_action_loss={metrics['action_loss']:.4f} "
          f"s1_judge_success={s1_judge['success']:.3f}")

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tools.learning_check import tiny_config
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    cfg = tiny_config(args.tmp, args.episodes, args.epochs)
    cfg.defrost()
    if args.seed:
        cfg.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET = args.seed
    if args.prog_threshold is not None:
        cfg.STOP_CONDITION.PROG_THRESHOLD = args.prog_threshold
    # mirror learning_check.py's cfg3 stage-2 tree, then cfg5 judge surgery
    cfg.DAGGER.ITERATIONS = 3
    cfg.DAGGER.EPOCHS = 4
    cfg.DAGGER.P = 0.5
    cfg.DAGGER.UPDATE_SIZE = max(8, args.episodes // 2)
    cfg.DAGGER.LR = 2.5e-4
    cfg.DAGGER.LMDB_FEATURES_DIR = os.path.join(args.tmp, "traj_da")
    cfg.CHECKPOINT_FOLDER = os.path.join(args.tmp, "ckpt_da")
    cfg.EVAL_CKPT_PATH_DIR = os.path.join(args.tmp, "ckpt_da", args.best_ckpt)
    cfg.EVAL.SPLIT = "val_unseen"
    cfg.EVAL.EPISODE_COUNT = 60
    cfg.TASK_CONFIG.DATASET.FAKE_EPISODES = max(
        120, cfg.TASK_CONFIG.DATASET.FAKE_EPISODES)
    cfg.METRIC_DIR = os.path.join(args.tmp, "judge_s2")
    cfg.freeze()
    s2_judge = DaggerTrainer(cfg, env_workers=False).eval()

    def each(d):
        fn = [f for f in os.listdir(d) if f.startswith("each_")][0]
        with open(os.path.join(d, fn)) as f:
            return json.load(f)

    s1_each = each(os.path.join(args.tmp, "judge_s1"))
    s2_each = each(os.path.join(args.tmp, "judge_s2"))
    ids = sorted(set(s1_each) & set(s2_each))
    d_err = [s2_each[i]["oracle_navigation_error"]
             - s1_each[i]["oracle_navigation_error"] for i in ids]
    n = max(len(d_err), 1)
    mean_d = sum(d_err) / n
    var = sum((x - mean_d) ** 2 for x in d_err) / max(n - 1, 1)
    se = (var / n) ** 0.5
    pd = {"mean": mean_d, "se": se, "n": n,
          "t": mean_d / se if se > 0 else 0.0}

    out = {
        "resumed_from": args.tmp,
        "train_final": metrics,
        "eval_untrained": base,
        "eval_trained": trained,
        "eval_stage2_best_ckpt": args.best_ckpt,
        "eval_trained_judge": s1_judge,
        "eval_stage2": s2_judge,
        "paired_err_delta": pd,
    }
    print(json.dumps(out, indent=2, default=float))

    # verdict identical to learning_check.py:281-310
    ok = (
        metrics.get("action_loss", 1.0) < 0.06
        and metrics.get("progress_monitor", 1.0) < 0.05
        and (trained.get("oracle_navigation_error", 99)
             < base.get("oracle_navigation_error", 99)
             or trained.get("path_length", 0) > 0.5)
    )
    better = (
        s2_judge.get("success", 0) >= s1_judge.get("success", 0) + 2.0 / 60 - 1e-9
        or (pd["mean"] < -0.1 and pd["t"] < -1.0)
    )
    not_worse = (
        s2_judge.get("success", 0) >= s1_judge.get("success", 0) - 1.0 / 60 - 1e-9
        and pd["mean"] <= 0.25
    )
    ok = ok and better and not_worse
    print("LEARNING CHECK:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
