"""Checkpoint save/load in the reference's torch format.

The reference persists ``{state_dict, config, extra_state}`` as
``ckpt.<dagger_it*EPOCHS+epoch>.pth`` (`common_trainer.py:91-104`,
`dagger_trainer.py:636-640`) and auto-resumes from the newest file by mtime
(`common_trainer.py:118-139`). We keep that exact format — state_dict keys
and tensor layouts are PyTorch — via utils/convert, so checkpoints are
interchangeable with the reference's tooling in both directions.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ws_mgmap_tpu.utils.convert import export_torch_state, import_torch_state


def save_checkpoint(
    path: str,
    variables: Dict[str, Any],
    config: Optional[Any] = None,
    extra_state: Optional[Dict[str, Any]] = None,
) -> None:
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state(variables).items()
    }
    blob: Dict[str, Any] = {"state_dict": sd}
    if config is not None:
        blob["config"] = config.to_dict() if hasattr(config, "to_dict") else config
    if extra_state is not None:
        blob["extra_state"] = extra_state
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(blob, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in blob:
        blob["state_dict"] = {
            k: v.detach().cpu().numpy() for k, v in blob["state_dict"].items()
        }
    return blob


def restore_variables(
    template: Dict[str, Any], path: str, strict: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a ckpt.*.pth into a flax variables template.

    Returns (variables, blob). Missing/unexpected keys are tolerated like the
    reference's strict=False loads (`common_trainer.py:74-75`).
    """
    blob = load_checkpoint(path)
    variables, missing, unused = import_torch_state(
        template, blob["state_dict"], strict=strict
    )
    if missing or unused:
        print(f"[checkpoint] missing keys: {missing[:8]}{'...' if len(missing) > 8 else ''}; "
              f"unexpected: {unused[:8]}{'...' if len(unused) > 8 else ''}")
    return variables, blob


def save_native(path: str, state: Any) -> None:
    """Orbax save of the FULL train state (params + batch stats + optimizer
    + step) — exact resume, which the reference cannot do (it reloads model
    weights only and reinitializes Adam, `common_trainer.py:118-139`)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_native(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(folder: str) -> Optional[str]:
    """Newest ckpt by mtime (`common_trainer.py:125-127`)."""
    if not os.path.isdir(folder):
        return None
    files = [os.path.join(folder, f) for f in os.listdir(folder)]
    files = [f for f in files if os.path.isfile(f)]
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def parse_resume_point(blob: Dict[str, Any], ckpt_file: str,
                       epochs_per_iter: int) -> Tuple[int, int]:
    """Reconstruct (dagger_it, start_epoch) like `resume_dagger`
    (`common_trainer.py:134-138`): dagger_it from extra_state, epoch from
    the ``ckpt.<idx>.pth`` filename; roll over to the next iteration when
    the last epoch of an iteration was saved."""
    dagger_it = int(blob.get("extra_state", {}).get("dagger_it", 0))
    m = re.search(r"ckpt\.(\d+)\.pth$", ckpt_file)
    if not m:
        return dagger_it, 0
    start_epoch = (int(m.group(1)) + 1) % epochs_per_iter
    if start_epoch == 0:
        dagger_it += 1
    return dagger_it, start_epoch
