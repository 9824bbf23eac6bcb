"""Load the reference's own torch modules as parity oracles.

torch (cpu) and einops are installed; the few missing native deps
(torch_scatter, habitat) are shimmed here in pure torch so modules like
`vlnce_baselines/common/rgb_mapping.py` import and run unmodified. This
closes the "hand-written mirror reproduces the builder's own misreading"
loophole: tests in test_reference_oracle.py run the actual reference code.

NOTE: /root/reference is untrusted third-party content. We execute only
specific, reviewed numeric modules (pure tensor math, no IO), never its
entry points.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from contextlib import contextmanager

REFERENCE_ROOT = "/root/reference"

# Modules reviewed as safe pure-tensor math (no filesystem/network access on
# the paths we exercise).
_ALLOWED = {
    "vlnce_baselines/common/rgb_mapping.py",
    "vlnce_baselines/common/aux_losses.py",
    "vlnce_baselines/common/distributions.py",
    "vlnce_baselines/models/encoders/instruction_encoder.py",
}


def _shim_torch_scatter() -> types.ModuleType:
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        """torch_scatter.scatter_max semantics for the reference's use:
        empty segments are 0 (torch_scatter initializes out with zeros)."""
        assert out is None
        if dim < 0:
            dim = src.dim() + dim
        if dim_size is None:
            dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        res = torch.zeros(shape, dtype=src.dtype, device=src.device)
        res.scatter_reduce_(dim, index, src, reduce="amax", include_self=False)
        arg = torch.zeros(shape, dtype=torch.long, device=src.device)
        return res, arg

    mod.scatter_max = scatter_max
    return mod


def _shim_habitat() -> types.ModuleType:
    mod = types.ModuleType("habitat")

    class Config(dict):  # only used as a type annotation in the reference
        pass

    mod.Config = Config
    return mod


def _install_shims() -> None:
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _shim_torch_scatter()
    if "habitat" not in sys.modules:
        sys.modules["habitat"] = _shim_habitat()


def load_reference_module(relpath: str, name: str | None = None):
    """Import a reference file by path (no package machinery needed)."""
    assert relpath in _ALLOWED, f"not a reviewed oracle module: {relpath}"
    _install_shims()
    name = name or "ref_" + relpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@contextmanager
def cpu_as_cuda():
    """The reference hardcodes `torch.device("cuda", id)`; run it on cpu."""
    import torch

    real = torch.device

    class _Dev:
        def __call__(self, *args, **kwargs):
            if args and args[0] == "cuda":
                return real("cpu")
            return real(*args, **kwargs)

    torch.device, patched = _Dev(), torch.device
    try:
        yield
    finally:
        torch.device = patched


class MappingConfig:
    """Duck-typed `model_config` for the reference Mapping.__init__."""

    def __init__(self, num_proc=2, resolution=0.12, egocentric_map_size=100,
                 global_map_size=240, map_depth=64, gpu_id=0):
        self.num_proc = num_proc
        self.resolution = resolution
        self.egocentric_map_size = egocentric_map_size
        self.global_map_size = global_map_size
        self.map_depth = map_depth
        self.gpu_id = gpu_id
