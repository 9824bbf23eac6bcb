"""Parity: flax PointNav DD-PPO controller vs torch mirror."""
import pytest

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tests.torch_mirrors import TorchResNetEncoder
from ws_mgmap_tpu.models.ddppo_policy import DdppoController, PointNavResNetPolicy
from ws_mgmap_tpu.utils.convert import import_torch_state

torch.manual_seed(3)
RNG = np.random.RandomState(9)


class TorchPointNav(nn.Module):
    """Mirror of habitat PointNavResNetPolicy (resnet50, LSTM-2)."""

    def __init__(self, hidden=512):
        super().__init__()
        self.visual_encoder = TorchResNetEncoder(spatial_size=128)
        self.visual_fc = nn.Sequential(
            nn.Flatten(), nn.Linear(2048, hidden), nn.ReLU(True))
        self.tgt_embeding = nn.Linear(3, 32)
        self.prev_action_embedding = nn.Embedding(5, 32)
        self.state_encoder_rnn = nn.LSTM(hidden + 64, hidden, num_layers=2)
        self.action_linear = nn.Linear(hidden, 4)
        self.critic_fc = nn.Linear(hidden, 1)

    def forward(self, depth, pointgoal, prev_actions, h, c, masks):
        rho, phi = pointgoal[:, 0], pointgoal[:, 1]
        goal = torch.stack([rho, torch.cos(-phi), torch.sin(-phi)], -1)
        tgt = self.tgt_embeding(goal)
        prev = self.prev_action_embedding(
            ((prev_actions.float() + 1) * masks.view(-1)).long())
        vis = self.visual_fc(self.visual_encoder(depth))
        x = torch.cat([vis, tgt, prev], dim=1)
        m = masks.view(1, -1, 1)
        out, (h2, c2) = self.state_encoder_rnn(x.unsqueeze(0), (h * m, c * m))
        logits = self.action_linear(out.squeeze(0))
        return logits, h2, c2


def rename(sd):
    out = {}
    for k, v in sd.items():
        k = k.replace("state_encoder_rnn.", "net.state_encoder.rnn.")
        k = k.replace("visual_encoder.", "net.visual_encoder.")
        k = k.replace("visual_fc.", "net.visual_fc.")
        k = k.replace("tgt_embeding.", "net.tgt_embeding.")
        k = k.replace("prev_action_embedding.", "net.prev_action_embedding.")
        k = k.replace("action_linear.", "action_distribution.linear.")
        k = k.replace("critic_fc.", "critic.fc.")
        out[k] = v.numpy()
    return out


@pytest.mark.slow
def test_pointnav_policy_parity():
    t_net = TorchPointNav()
    t_net.eval()

    depth = RNG.rand(2, 256, 256, 1).astype(np.float32)
    goal = np.array([[2.0, 0.5], [4.0, -1.2]], np.float32)
    prev = np.array([1, 3], np.int64)
    h = RNG.randn(2, 2, 512).astype(np.float32)
    c = RNG.randn(2, 2, 512).astype(np.float32)
    masks = np.array([[1.0], [0.0]], np.float32)

    with torch.no_grad():
        want_logits, want_h, want_c = t_net(
            torch.from_numpy(depth), torch.from_numpy(goal),
            torch.from_numpy(prev), torch.from_numpy(h),
            torch.from_numpy(c), torch.from_numpy(masks))

    ctrl = DdppoController()
    variables, missing, unused = import_torch_state(
        ctrl.variables, rename(t_net.state_dict()))
    assert not missing, missing[:6]
    assert not unused, unused[:6]

    hidden = jnp.concatenate([jnp.asarray(h), jnp.asarray(c)], axis=0)
    action, logits, value, new_hidden = ctrl.policy.apply(
        variables, jnp.asarray(depth), jnp.asarray(goal),
        jnp.asarray(prev), hidden, jnp.asarray(masks),
        method=PointNavResNetPolicy.act)

    np.testing.assert_allclose(np.asarray(logits), want_logits.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_hidden[:2]), want_h.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_hidden[2:]), want_c.numpy(),
                               atol=2e-3, rtol=1e-3)
    assert np.array_equal(np.asarray(action),
                          want_logits.argmax(-1).numpy())


def test_controller_plan_protocol():
    ctrl = DdppoController()
    depth = RNG.rand(256, 256, 1).astype(np.float32)
    a0 = ctrl.plan(depth, np.array([3.0, 0.1]), t=0)
    assert a0 in (0, 1, 2, 3)
    h_after = np.asarray(ctrl.hidden).copy()
    a1 = ctrl.plan(depth, np.array([2.5, 0.05]), t=1)
    assert a1 in (0, 1, 2, 3)
    assert np.abs(np.asarray(ctrl.hidden)).sum() > 0
    ctrl.reset()
    assert np.abs(np.asarray(ctrl.hidden)).sum() == 0
