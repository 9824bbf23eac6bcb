"""Converter + forward parity: flax encoders vs torch mirrors.

Builds randomly-initialized torch oracles (tests/torch_mirrors.py), imports
their state_dicts through utils/convert, and checks activations match in
eval mode (running-stats BN / GroupNorm).
"""
import pytest

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_mirrors import TorchResNetUNet, TorchResNetEncoder
from ws_mgmap_tpu.models.unet import ResNetUNet
from ws_mgmap_tpu.models.depth_encoder import ResNetEncoder
from ws_mgmap_tpu.utils.convert import (
    export_torch_state,
    import_torch_state,
)

torch.manual_seed(0)
RNG = np.random.RandomState(4)


def randomize_bn_stats(module):
    """Make BN running stats non-trivial so eval-mode parity is meaningful."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


@pytest.mark.slow
def test_unet_parity():
    t_model = TorchResNetUNet()
    randomize_bn_stats(t_model)
    t_model.eval()

    x = RNG.rand(2, 3, 64, 64).astype(np.float32) * 255.0
    with torch.no_grad():
        t_l4, t_proj, t_seg = t_model(torch.from_numpy(x))

    f_model = ResNetUNet()
    template = f_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    sd = {k: v.numpy() for k, v in t_model.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing, f"missing keys: {missing[:5]}"
    assert not unused, f"unused keys: {unused[:5]}"

    f_l4, f_proj, f_seg = f_model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_l4), (0, 3, 1, 2)), t_l4.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_proj), (0, 3, 1, 2)), t_proj.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_seg), (0, 3, 1, 2)), t_seg.numpy(), atol=2e-3, rtol=1e-3
    )


@pytest.mark.slow
def test_unet_roundtrip_export():
    """flax -> torch export must reproduce the torch state_dict exactly."""
    t_model = TorchResNetUNet()
    sd = {k: v.numpy() for k, v in t_model.state_dict().items()}

    f_model = ResNetUNet()
    template = f_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    variables, _, _ = import_torch_state(template, sd)
    back = export_torch_state(
        variables, reference_shapes={k: v.shape for k, v in sd.items()}
    )
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(back[k], v, atol=0, rtol=0, err_msg=k)


@pytest.mark.slow
def test_depth_encoder_parity():
    t_model = TorchResNetEncoder(spatial_size=64)  # depth 128 -> pooled 64
    t_model.eval()

    depth = RNG.rand(2, 128, 128, 1).astype(np.float32)
    with torch.no_grad():
        want = t_model(torch.from_numpy(depth)).numpy()

    f_model = ResNetEncoder(spatial_size=64)
    template = f_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)))
    sd = {k: v.numpy() for k, v in t_model.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing, missing[:5]
    assert not unused, unused[:5]

    got = f_model.apply(variables, jnp.asarray(depth))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-3, rtol=1e-3
    )
    assert got.shape == (2, 2, 2, 512)  # 2048/(2*2) channels at 64/32 spatial
