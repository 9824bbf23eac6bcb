"""PyTorch state_dict <-> Flax variables conversion.

The reference ships three pretrained torch checkpoints (UNet segmenter,
DD-PPO depth encoder, DD-PPO local controller — `config/default.py:102,107`,
`action_maker.py:60`) and saves policy checkpoints as
``{state_dict, config, extra_state}`` (`common_trainer.py:91-104`).  Our
modules name parameters so that the torch key is recoverable mechanically
from the flax path:

  flax ``a/b/0/kernel``            <- torch ``a.b.0.weight``
  flax ``.../bn/{scale,bias}``     <- torch ``...bn.{weight,bias}``
  flax batch_stats ``.../{mean,var}`` <- torch ``...{running_mean,running_var}``
  conv kernels: torch [O,I,kh,kw]  -> flax [kh,kw,I,O]
  transposed conv: torch [I,O,kh,kw] -> flax [kh,kw,I,O] + spatial flip
  linear: torch [out,in]           -> flax [in,out]
  conv1d(k=1) as Dense: torch [out,in,1] -> flax [in,out]
  GRU/LSTM weight_ih_l0 etc.       -> copied verbatim (torch layout kept)

Both directions are provided so training checkpoints remain loadable by the
reference's tooling (BASELINE "checkpoint format preserved").
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from flax import traverse_util

LEAF_TO_TORCH = {
    "kernel": "weight",
    "kernel_t": "weight",  # transposed-conv kernels (TConvTranspose)
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    "mean": "running_mean",
    "var": "running_var",
}

_RNN_LEAVES = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def _is_raw_torch_leaf(leaf: str) -> bool:
    """Params stored verbatim in torch layout (raw dotted names created at
    the policy level, RNN weights, the AddBias logstd)."""
    return (
        "." in leaf
        or leaf == "_bias"
        or any(leaf.startswith(p) for p in _RNN_LEAVES)
    )


def _torch_key(path: Tuple[str, ...]) -> str:
    *mods, leaf = path
    mapped = leaf if _is_raw_torch_leaf(leaf) else LEAF_TO_TORCH.get(leaf, leaf)
    return ".".join(list(mods) + [mapped])


def _to_flax_leaf(torch_arr: np.ndarray, flax_shape: Tuple[int, ...],
                  leaf: str) -> np.ndarray:
    """Transform keyed on the *leaf kind*, never on accidental shape matches
    (a square dense kernel must still transpose)."""
    t = np.asarray(torch_arr)
    fs = tuple(flax_shape)
    if _is_raw_torch_leaf(leaf) or leaf in ("scale", "bias", "mean", "var",
                                            "embedding"):
        out = t
        if t.ndim == len(fs) + 1 and t.shape[-1] == 1:
            out = t[..., 0]  # conv1d(k=1) weight stored raw as [out, in]
    elif leaf == "kernel":
        if t.ndim == 4:            # conv [O,I,kh,kw] -> [kh,kw,I,O]
            out = np.transpose(t, (2, 3, 1, 0))
        elif t.ndim == 3:          # conv1d k=1 [O,I,1] -> dense [I,O]
            out = np.transpose(t[..., 0], (1, 0))
        else:                      # dense [out,in] -> [in,out]
            out = t.T
    elif leaf == "kernel_t":       # convT [I,O,kh,kw] -> [kh,kw,I,O] + flip
        out = np.transpose(t, (2, 3, 0, 1))[::-1, ::-1]
    else:
        out = t
    if out.shape != fs:
        raise ValueError(
            f"cannot map torch {t.shape} to flax {fs} for leaf {leaf!r}")
    return np.ascontiguousarray(out)


def _to_torch_leaf(flax_arr: np.ndarray, torch_shape: Optional[Tuple[int, ...]],
                   leaf: str) -> np.ndarray:
    a = np.asarray(flax_arr)
    if _is_raw_torch_leaf(leaf) or leaf in ("scale", "bias", "mean", "var",
                                            "embedding"):
        if (torch_shape is not None and len(torch_shape) == a.ndim + 1
                and torch_shape[-1] == 1):
            return np.ascontiguousarray(a[..., None])  # raw dense -> conv1d
        return a
    if leaf == "kernel":
        if a.ndim == 4:
            return np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
        if torch_shape is not None and len(torch_shape) == 3:
            return np.ascontiguousarray(a.T[..., None])  # dense -> conv1d k=1
        return np.ascontiguousarray(a.T)
    if leaf == "kernel_t":
        return np.ascontiguousarray(np.transpose(a[::-1, ::-1], (2, 3, 0, 1)))
    return a


def import_torch_state(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "",
    strict: bool = False,
) -> Tuple[Dict[str, Any], list, list]:
    """Fill a flax variables pytree from a torch state_dict.

    Args:
      variables: template (e.g. from ``module.init``) with collections
        'params' and optionally 'batch_stats'.
      state_dict: torch name -> numpy array.
      prefix: optional torch key prefix to strip/add (e.g. "net.").
    Returns:
      (new_variables, missing_torch_keys, unused_torch_keys)
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    missing = []
    out = {}
    for coll, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        new_flat = {}
        for path, leaf in flat.items():
            tkey = prefix + _torch_key(path)
            if tkey in sd:
                new_flat[path] = _to_flax_leaf(
                    sd[tkey], leaf.shape, path[-1]
                ).astype(np.asarray(leaf).dtype)
                used.add(tkey)
            else:
                new_flat[path] = leaf
                missing.append(tkey)
        out[coll] = traverse_util.unflatten_dict(new_flat)
    unused = [k for k in sd if k not in used and "num_batches_tracked" not in k]
    if strict and (missing or unused):
        raise KeyError(f"missing={missing[:10]} unused={unused[:10]}")
    return out, missing, unused


def export_torch_state(
    variables: Mapping[str, Any],
    prefix: str = "",
    reference_shapes: Optional[Mapping[str, Tuple[int, ...]]] = None,
) -> Dict[str, np.ndarray]:
    """Flatten flax variables into a torch-style state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for coll, tree in variables.items():
        if coll not in ("params", "batch_stats"):
            continue
        for path, leaf in traverse_util.flatten_dict(tree).items():
            tkey = prefix + _torch_key(path)
            ref_shape = None
            if reference_shapes and tkey in reference_shapes:
                ref_shape = tuple(reference_shapes[tkey])
            out[tkey] = _to_torch_leaf(np.asarray(leaf), ref_shape, path[-1])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt on CPU and return a flat numpy state_dict.

    Handles the three reference checkpoint framings:
      * raw state_dict,
      * {"state_dict": ...} (policy ckpts, `common_trainer.py:98-104`),
      * {"models": {"img_segm_model": ...}} (UNet ckpt, `unet_encoder.py:19-21`).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "models" in blob:
        sd = blob["models"]["img_segm_model"]
        sd = {".".join(k.split(".")[2:]): v for k, v in sd.items()}
    elif isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
    else:
        sd = blob
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def import_imagenet_resnet18(variables: Mapping[str, Any],
                             sd: Mapping[str, np.ndarray]):
    """Seed the UNet + MapDecoder backbones from a torchvision resnet18
    ImageNet state_dict (from-scratch stage-1 init, reference
    `unet_encoder.py:34` / `map_encoder.py:75` `pretrained=True`).

    Key remapping (torchvision -> our module paths):
      conv1/bn1      -> layer0.0 / layer0.1
      layer1.*       -> layer1.1.*   (maxpool+layer1 live under one module)
      layer2..layer4 -> unchanged    (UNet only; MapDecoder has no 2..4)
    The MapDecoder's conv1 is replaced by the reference (256-channel input,
    `map_encoder.py:76`), so only bn1 + layer1 transfer there.
    Returns (variables, n_loaded_leaves).
    """
    def remap(key: str) -> Optional[str]:
        if key.startswith("conv1."):
            return "layer0.0." + key[len("conv1."):]
        if key.startswith("bn1."):
            return "layer0.1." + key[len("bn1."):]
        if key.startswith("layer1."):
            return "layer1.1." + key[len("layer1."):]
        if key.startswith(("layer2.", "layer3.", "layer4.")):
            return key
        return None  # fc.* / num_batches_tracked: unused

    unet_sd = {}
    dec_sd = {}
    for k, v in sd.items():
        m = remap(k)
        if m is None:
            continue
        unet_sd[f"net.rgb_encoder.base_model.{m}"] = v
        if m.startswith(("layer0.1.", "layer1.1.")) and not m.startswith(
                "layer0.0."):
            dec_sd[f"net.map_decoder.{m}"] = v

    variables, _, unused_u = import_torch_state(variables, unet_sd)
    variables, _, unused_d = import_torch_state(variables, dec_sd)
    loaded = (len(unet_sd) - len(unused_u)) + (len(dec_sd) - len(unused_d))
    return variables, loaded
