#!/usr/bin/env python3
"""ws_mgmap_tpu experiment entry point.

Preserves the reference CLI surface (`run.py:24-70`):

    python run.py --run-type {train,eval,inference} \
        -c ws_mgmap_tpu/config/CMA_AUG.yaml -e /path/to/model_dir \
        [--note tag] [OPT.KEY value ...]

Multi-process data parallelism uses one process per host with all local TPU
chips on a jax mesh (no torch.distributed.launch); multi-host runs
initialize jax.distributed from standard cluster env vars.
"""
import argparse
import os
import random
from typing import List, Optional

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-type", choices=["train", "eval", "inference"],
                        default="train")
    parser.add_argument("-c", "--exp-config", type=str, required=True,
                        help="path to experiment yaml")
    parser.add_argument("-e", "--model-dir", default=None,
                        help="path to save checkpoints, logs, metrics")
    parser.add_argument("--note", default="base")
    parser.add_argument("-g", "--gpus", default=None, nargs="+", type=int,
                        help="accepted for reference-CLI compatibility (unused on TPU)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--local_rank", default=-1, type=int)
    args = parser.parse_args()
    run_exp(args.exp_config, args.run_type, args.model_dir, args.note,
            args.opts, max(args.local_rank, 0))


def run_exp(exp_config: str, run_type: str, model_dir: Optional[str],
            note: str, opts: Optional[List[str]] = None,
            local_rank: int = 0) -> None:
    # WS_MGMAP_PLATFORM=cpu forces the backend even where a site plugin
    # overrides jax_platforms programmatically (e.g. the axon TPU relay).
    platform = os.environ.get("WS_MGMAP_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from ws_mgmap_tpu.config.default import get_config, refine_config, set_save_dir
    from ws_mgmap_tpu.train.trainer import DaggerTrainer
    from ws_mgmap_tpu.utils.bookkeeping import (
        check_exist_file, save_config, save_sh_n_codes)

    config = get_config(exp_config, opts)
    config = set_save_dir(config, run_type, model_dir, note, local_rank)
    config = refine_config(config, local_rank)

    world_size = int(os.environ.get("WORLD_SIZE", "1"))
    rank = int(os.environ.get("RANK", str(local_rank)))
    if world_size > 1:
        import jax
        jax.distributed.initialize()

    if rank == 0 and model_dir:
        check_exist_file(config)
        save_sh_n_codes(config, run_type,
                        ignore_dir=["data", "result", "build", "temp"])
        save_config(config, run_type)

    random.seed(config.TASK_CONFIG.SEED)
    np.random.seed(config.TASK_CONFIG.SEED)

    trainer = DaggerTrainer(config, rank=rank, world_size=world_size)
    if run_type == "train":
        trainer.train()
    elif run_type == "eval":
        trainer.eval()
    elif run_type == "inference":
        trainer.inference()


if __name__ == "__main__":
    main()
