"""Experiment bookkeeping: run-dir snapshots of code, command, config.

Re-provides `check_exist_file` / `save_sh_n_codes` / `save_config`
(`vlnce_baselines/common/utils.py:48-99`).
"""
from __future__ import annotations

import os
import shutil
import socket
import sys
import zipfile
from glob import glob
from shlex import quote


def check_exist_file(config, interactive: bool = False) -> None:
    dirs = [config.VIDEO_DIR, config.TENSORBOARD_DIR, config.CHECKPOINT_FOLDER]
    existing = [d for d in dirs if os.path.exists(d)]
    if not existing:
        return
    if config.OVERWRITE:
        for d in existing:
            shutil.rmtree(d)
        return
    if interactive:
        order = None
        while order not in ("y", "n"):
            order = input("Output directory already exists! Overwrite? (y/n)")
        if order == "y":
            for d in existing:
                shutil.rmtree(d)


def save_sh_n_codes(config, run_type: str, ignore_dir=("",)) -> None:
    code_dir = getattr(config, "CODE_DIR", None)
    if not code_dir:
        return
    os.makedirs(code_dir, exist_ok=True)

    name = os.path.join(code_dir, f"run_{run_type}_{socket.gethostname()}.sh")
    with open(name, "w") as f:
        for env in ("CUDA_VISIBLE_DEVICES", "JAX_PLATFORMS", "XLA_FLAGS"):
            value = os.environ.get(env)
            if value is not None:
                f.write(f"export {env}={quote(value)}\n")
        f.write(sys.executable + " " + " ".join(quote(a) for a in sys.argv) + "\n")

    name = os.path.join(code_dir, "code.zip")
    with zipfile.ZipFile(name, mode="w", compression=zipfile.ZIP_DEFLATED) as zf:
        first = [p for p in glob("*") if p not in ignore_dir]
        files = []
        for pattern in (p + "/**" for p in first):
            files.extend(glob(pattern, recursive=True))
        files += [p for p in first if os.path.isfile(p)]
        for fn in files:
            fn = fn[:-1] if fn.endswith("/") else fn
            if os.path.isfile(fn):
                zf.write(fn)


def save_config(config, run_type: str) -> None:
    config_dir = getattr(config, "CONFIG_DIR", None)
    if not config_dir:
        return
    os.makedirs(config_dir, exist_ok=True)
    with open(os.path.join(config_dir, f"config_of_{run_type}.txt"), "w") as f:
        f.write(str(config))
