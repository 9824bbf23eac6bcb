#!/usr/bin/env python3
"""CLI dress rehearsal on real-format data (VERDICT r2 #5).

Builds a miniature R2R_VLNCE tree in the reference's EXACT file schemas
({split}.json.gz episodes + instruction_vocab, embeddings.json.gz,
{split}_gt.json.gz, map_data/.../ep_<id>.npy) and drives the REAL `run.py`
command surface against it end-to-end on FakeSim scenes:

    train (stage-1 teacher forcing)  -> checkpoints written
    train (stage-2 DAgger fine-tune) -> beta-mixed collection + ckpts
    eval                             -> metric JSONs in run dir
    inference                        -> predictions file

This proves the data layer, the config surgery (`refine_config` split
propagation, `set_save_dir` run-dir layout), dotted-key CLI overrides
(`run.py:56-61`) and the CLI glue in one shot — the layer unit fixtures
skip. Reference surface: `run.py:24-70`, `config/default.py:155-231`.

Usage: python tools/cli_rehearsal.py [--workdir DIR] [--episodes 4]
Exits 0 only if all four run-types complete and produce their artifacts.
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_tree(root: str, n_eps: int):
    from test_real_data_formats import VOCAB, build_fixtures

    for split in ("train", "val_seen", "val_unseen", "val_unseen_min"):
        build_fixtures(root, split=split, n_eps=n_eps)
    return VOCAB


def run_cli(run_type: str, cfg_yaml: str, model_dir: str, opts, env=None,
            timeout=1800):
    cmd = [sys.executable, os.path.join(REPO, "run.py"),
           "--run-type", run_type, "-c", cfg_yaml, "-e", model_dir] + opts
    e = dict(os.environ, WS_MGMAP_PLATFORM="cpu", **(env or {}))
    print(f"[cli_rehearsal] $ {' '.join(cmd[:8])} ... ({run_type})",
          flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       env=e, cwd=REPO)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"{run_type} FAILED rc={r.returncode}")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--episodes", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="cli_rehearsal_")
    data = os.path.join(work, "R2R_VLNCE_v1-2_preprocessed")
    vocab = build_tree(data, args.episodes)
    model_dir = os.path.join(work, "exp")

    yaml_path = os.path.join(work, "TINY_REAL.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"""BASE_TASK_CONFIG_PATH: ws_mgmap_tpu/config/vlnce_task.yaml
NUM_PROCESSES: 2
EVAL:
  USE_CKPT_CONFIG: False
  SPLIT: val_seen
  EPISODE_COUNT: {args.episodes}
DAGGER:
  ITERATIONS: 1
  EPOCHS: 2
  UPDATE_SIZE: {args.episodes}
  BATCH_SIZE: 2
  P: 1.0
  LR: 1e-3
MODEL:
  INSTRUCTION_ENCODER:
    vocab_size: {len(vocab)}
    hidden_size: 16
    use_pretrained_embeddings: True
  RGB_ENCODER:
    output_size: 32
    unet_width: 0.25
  DEPTH_ENCODER:
    output_size: 16
    spatial_hw: 1
  MAP_ENCODER:
    output_size: 32
    ego_map_size: 20
  STATE_ENCODER:
    hidden_size: 64
  RGBMAPPING:
    map_depth: 16
    global_map_size: 48
    egocentric_map_size: 20
""")

    # dotted-key CLI overrides exercise the reference's OPTS merge path
    data_opts = [
        "TASK_CONFIG.DATASET.DATA_PATH",
        os.path.join(data, "{split}.json.gz"),
        "TASK_CONFIG.TASK.NDTW.GT_PATH",
        os.path.join(data, "{split}_gt.json.gz"),
        "TASK_CONFIG.TASK.GT_SEMANTIC_MAP_SENSOR.DATA_DIR",
        os.path.join(data, "map_data", "{split}"),
        "MODEL.INSTRUCTION_ENCODER.embedding_file",
        os.path.join(data, "embeddings.json.gz"),
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "60",
        "ep_max_len", "60",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "64",
    ]

    # ---- stage-1 teacher forcing --------------------------------------------
    run_cli("train", yaml_path, model_dir, data_opts, timeout=args.timeout)
    ckpts = glob.glob(os.path.join(model_dir, "run_train_base",
                                   "checkpoint", "ckpt.*.pth"))
    assert ckpts, "stage-1 produced no checkpoints"
    latest = max(ckpts, key=lambda p: int(p.split(".")[-2]))
    print(f"[cli_rehearsal] stage-1 OK: {len(ckpts)} ckpts", flush=True)

    # ---- stage-2 DAgger fine-tune (DA_TUNE-style yaml keys) ------------------
    da_yaml = os.path.join(work, "TINY_REAL_DA_TUNE.yaml")
    with open(da_yaml, "w") as f:
        f.write(open(yaml_path).read().replace(
            "ITERATIONS: 1", "ITERATIONS: 2").replace(
            "P: 1.0", "P: 0.5"))
    run_cli("train", da_yaml, os.path.join(work, "exp_da"), data_opts + [
        "DAGGER.LOAD_FROM_CKPT", "True", "DAGGER.CKPT_TO_LOAD", latest],
        timeout=args.timeout)
    da_ckpts = glob.glob(os.path.join(work, "exp_da", "run_train_base",
                                      "checkpoint", "ckpt.*.pth"))
    assert da_ckpts, "stage-2 produced no checkpoints"
    print(f"[cli_rehearsal] stage-2 OK: {len(da_ckpts)} ckpts", flush=True)

    # ---- eval ----------------------------------------------------------------
    eval_dir = os.path.join(work, "exp_eval")
    run_cli("eval", yaml_path, eval_dir, data_opts + [
        "EVAL_CKPT_PATH_DIR", latest], timeout=args.timeout)
    metric_files = glob.glob(os.path.join(eval_dir, "run_eval_base",
                                          "metric", "stats_ckpt_*.json"))
    assert metric_files, "eval produced no metric JSON"
    with open(metric_files[0]) as f:
        metrics = json.load(f)
    assert "success" in metrics and "spl" in metrics, metrics
    print(f"[cli_rehearsal] eval OK: {metrics}", flush=True)

    # ---- inference -----------------------------------------------------------
    pred_path = os.path.join(work, "predictions.json")
    run_cli("inference", yaml_path, os.path.join(work, "exp_inf"),
            data_opts + ["INFERENCE.CKPT_PATH", latest,
                         "INFERENCE.SPLIT", "val_unseen",
                         "INFERENCE.PREDICTIONS_FILE", pred_path],
            timeout=args.timeout)
    with open(pred_path) as f:
        preds = json.load(f)
    assert len(preds) >= 1, "inference wrote no trajectories"
    print(f"[cli_rehearsal] inference OK: {len(preds)} trajectories",
          flush=True)

    print("CLI REHEARSAL: PASS")


if __name__ == "__main__":
    main()
