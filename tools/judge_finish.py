#!/usr/bin/env python3
"""Finish an interrupted two-stage learning check: run BOTH judge evals.

`tools/resume_judge.py` covers a cut between the two final judge evals
(stage-1 judge already in the log). This tool covers the earlier cut
point — stage-2 training finished (all `ckpt_da` checkpoints on disk) but
the per-checkpoint 30-episode selection evals and the judge evals had not
run. It runs the paired 60-episode val_unseen judge evals (stage-1 ckpt
vs a caller-chosen stage-2 ckpt), recomputes the exact verdict from
`learning_check.py:281-310`, and appends a clearly-marked section to the
tee'd log so the committed artifact is a complete record.

The stage-2 checkpoint is passed explicitly (`--best-ckpt`): when the
30-episode selection evals did not run, select on the 8-episode
in-training evals already in the log and say so — SELECTION quality only
decides which stage-2 candidate is judged; the JUDGMENT protocol (paired
60 held-out val_unseen episodes, identical episode set) is unchanged.

Usage:
  python tools/judge_finish.py --tmp /root/repo/.lc_work/learncheck_XXXX \
      --seed 7 --episodes 192 --prog-threshold 0.40 \
      --best-ckpt ckpt.7.pth --log logs/learncheck_seed7_....log
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.resume_judge import parse_log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmp", required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--episodes", type=int, default=192)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--best-ckpt", required=True,
                    help="stage-2 checkpoint to judge (see docstring)")
    ap.add_argument("--log", required=True)
    ap.add_argument("--prog-threshold", type=float, default=None,
                    help="must match the interrupted run's --prog-threshold")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    # ---- tee everything below into the run log (append, marked) -----------
    log_f = open(args.log, "a", buffering=1)
    log_f.write("\n")

    class _Tee:
        def __init__(self, stream):
            self._s = stream

        def write(self, data):
            self._s.write(data)
            log_f.write(data)
            return len(data)

        def flush(self):
            self._s.flush()
            log_f.flush()

    sys.stdout = _Tee(sys.__stdout__)
    sys.stderr = _Tee(sys.__stderr__)

    evals, epochs = parse_log(args.log)
    base = next(m for n, m, p in evals if n == 30 and p is None)
    trained = next(m for n, m, p in evals
                   if n == 30 and p and "/ckpt/ckpt." in p)
    s1_epochs = []
    for it, ep, m in epochs:
        if it == 0 and ep == len(s1_epochs):
            s1_epochs.append(m)
        elif s1_epochs and it == 0 and ep == 0:
            break  # stage 2 restarted iteration numbering
    metrics = s1_epochs[-1]

    print(f"[judge_finish] finishing interrupted run in {args.tmp}: paired "
          f"judge evals (stage-1 ckpt vs {args.best_ckpt}) on val_unseen x60")
    print(f"[judge_finish] parsed from log: base_onav="
          f"{base['oracle_navigation_error']:.3f} "
          f"s1_action_loss={metrics['action_loss']:.4f} "
          f"s1_val_seen_success={trained['success']:.3f}")

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tools.learning_check import tiny_config
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    s1_ckpt = ckpt_lib.latest_checkpoint(os.path.join(args.tmp, "ckpt"))
    judged = {}
    for name, ck in (("s1", s1_ckpt),
                     ("s2", os.path.join(args.tmp, "ckpt_da",
                                         args.best_ckpt))):
        # mirror learning_check.py's cfg3 stage-2 tree, then cfg5 surgery
        cfg = tiny_config(args.tmp, args.episodes, args.epochs)
        cfg.defrost()
        if args.seed:
            cfg.TASK_CONFIG.DATASET.FAKE_SEED_OFFSET = args.seed
        if args.prog_threshold is not None:
            cfg.STOP_CONDITION.PROG_THRESHOLD = args.prog_threshold
        cfg.EVAL_CKPT_PATH_DIR = ck
        cfg.EVAL.SPLIT = "val_unseen"
        cfg.EVAL.EPISODE_COUNT = 60
        cfg.TASK_CONFIG.DATASET.FAKE_EPISODES = max(
            120, cfg.TASK_CONFIG.DATASET.FAKE_EPISODES)
        cfg.METRIC_DIR = os.path.join(args.tmp, f"judge_{name}")
        cfg.freeze()
        agg = DaggerTrainer(cfg, env_workers=False).eval()
        fn = [f for f in os.listdir(cfg.METRIC_DIR)
              if f.startswith("each_")][0]
        with open(os.path.join(cfg.METRIC_DIR, fn)) as f:
            judged[name] = (agg, json.load(f))

    s1_judge, s1_each = judged["s1"]
    s2_judge, s2_each = judged["s2"]
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
        "finished_from": args.tmp,
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
