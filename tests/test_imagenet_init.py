"""From-scratch init path: torchvision resnet18 ImageNet weights seed the
UNet encoder + MapDecoder stem (reference `unet_encoder.py:34`,
`map_encoder.py:75` pretrained=True); without them, a loud warning fires."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_mirrors import ResNet18Children
from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
from ws_mgmap_tpu.ops.mapping import init_global_map
from ws_mgmap_tpu.utils.convert import import_imagenet_resnet18


def _resnet18_state_dict():
    """torchvision-shaped resnet18 state_dict (torchvision key names)."""
    torch.manual_seed(0)
    children = ResNet18Children(3)
    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
    for stat, shape in (("weight", 64), ("bias", 64), ("running_mean", 64),
                        ("running_var", 64)):
        sd[f"bn1.{stat}"] = (torch.rand(shape) + 0.5 if "var" in stat
                             else torch.randn(shape) * 0.1)
    # reuse the mirror's torch resnet layers for exact shapes/names
    for lname, mod in (("layer1", children.layer1), ("layer2", children.layer2),
                       ("layer3", children.layer3), ("layer4", children.layer4)):
        for k, v in mod.state_dict().items():
            if "num_batches" in k:
                continue
            sd[f"{lname}.{k}"] = torch.randn_like(v) * 0.1 if v.ndim else v
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)
    return {k: v.numpy() for k, v in sd.items()}


def _policy_variables():
    cfg = MGMapConfig()
    policy = BasePolicy(cfg)
    obs = {
        "instruction": jnp.zeros((1, 200), jnp.int32),
        "rgb": jnp.zeros((1, 224, 224, 3)),
        "depth": jnp.zeros((1, 256, 256, 1)),
        "gps": jnp.zeros((1, 2)),
        "compass": jnp.zeros((1, 1)),
    }
    variables = jax.jit(lambda k: policy.init(
        k, obs, jnp.zeros((2, 1, cfg.hidden_size)), jnp.zeros((1, 1)),
        init_global_map(1, cfg.mapper), method=BasePolicy.act))(
            jax.random.PRNGKey(0))
    return jax.tree.map(np.asarray, variables)


@pytest.mark.slow
def test_imagenet_resnet18_seeds_unet_and_decoder():
    variables = _policy_variables()
    sd = _resnet18_state_dict()
    new_vars, n = import_imagenet_resnet18(variables, sd)
    assert n >= 100, n  # full encoder + decoder stem

    p_unet = new_vars["params"]["net"]["rgb_encoder"]["base_model"]
    # conv1 -> layer0/0 with [O,I,kh,kw] -> [kh,kw,I,O]
    np.testing.assert_allclose(
        p_unet["layer0"]["0"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6)
    # layer2 block 0 conv1 transfers verbatim (modulo layout)
    np.testing.assert_allclose(
        p_unet["layer2"]["0"]["conv1"]["kernel"],
        np.transpose(sd["layer2.0.conv1.weight"], (2, 3, 1, 0)), atol=1e-6)
    # running stats land in batch_stats
    bs_unet = new_vars["batch_stats"]["net"]["rgb_encoder"]["base_model"]
    np.testing.assert_allclose(bs_unet["layer0"]["1"]["mean"],
                               sd["bn1.running_mean"], atol=1e-6)

    # decoder: bn1 + layer1 transferred, conv1 NOT (reference replaces it)
    p_dec = new_vars["params"]["net"]["map_decoder"]
    np.testing.assert_allclose(
        p_dec["layer1"]["1"]["0"]["conv1"]["kernel"],
        np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)), atol=1e-6)
    old_dec_conv1 = variables["params"]["net"]["map_decoder"]["layer0"]["0"][
        "kernel"]
    np.testing.assert_array_equal(p_dec["layer0"]["0"]["kernel"],
                                  old_dec_conv1)


def test_from_scratch_warns_loudly(tmp_path):
    from tests.test_integration import tiny_config
    from ws_mgmap_tpu.train.trainer import DaggerTrainer

    cfg = tiny_config(str(tmp_path))
    trainer = DaggerTrainer(cfg, env_workers=False)
    with pytest.warns(UserWarning, match="RANDOM init"):
        trainer.init_variables()
