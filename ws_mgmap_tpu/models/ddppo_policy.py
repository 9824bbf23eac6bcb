"""DD-PPO PointNav local controller (frozen, eval-time).

Re-design of `DdppoPolicy` (`vlnce_baselines/models/ddppo_policy.py:14-81`):
habitat's `PointNavResNetPolicy` — GroupNorm ResNet50 over depth, target
(rho, phi) embedding, previous-action embedding, 2-layer LSTM core,
categorical head over {STOP, FORWARD, LEFT, RIGHT}. Loads
``gibson-4plus-mp3d-train-val-test-resnet50.pth`` via utils/convert (torch
key prefix ``actor_critic.``).

The controller converts the high-level policy's waypoint into discrete sim
actions during evaluation (`action_maker.py:47-124`).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ws_mgmap_tpu.models.depth_encoder import ResNetEncoder
from ws_mgmap_tpu.models.layers import tdense
from ws_mgmap_tpu.models.rnn import lstm_cell

Array = jax.Array


class PointNavResNetNet(nn.Module):
    """habitat `PointNavResNetNet` (hidden 512, LSTM-2, resnet50)."""

    hidden_size: int = 512
    num_actions: int = 4
    num_layers: int = 2

    def setup(self):
        self.visual_encoder = ResNetEncoder(spatial_size=128,
                                            name="visual_encoder")
        self._visual_fc = (
            self.param("visual_fc.1.weight",
                       nn.initializers.lecun_normal(),
                       (self.hidden_size, 2048)),
            self.param("visual_fc.1.bias", nn.initializers.zeros,
                       (self.hidden_size,)),
        )
        # goal input: [rho, cos(-phi), sin(-phi)]
        self._tgt = (
            self.param("tgt_embeding.weight", nn.initializers.lecun_normal(),
                       (32, 3)),
            self.param("tgt_embeding.bias", nn.initializers.zeros, (32,)),
        )
        self.prev_action_embedding = nn.Embed(
            self.num_actions + 1, 32, name="prev_action_embedding")
        g = 4 * self.hidden_size
        init = nn.initializers.uniform(scale=0.08)
        in_size = self.hidden_size + 32 + 32
        lstm = []
        for layer in range(self.num_layers):
            lstm.append((
                self.param(f"state_encoder.rnn.weight_ih_l{layer}", init,
                           (g, in_size if layer == 0 else self.hidden_size)),
                self.param(f"state_encoder.rnn.weight_hh_l{layer}", init,
                           (g, self.hidden_size)),
                self.param(f"state_encoder.rnn.bias_ih_l{layer}", init, (g,)),
                self.param(f"state_encoder.rnn.bias_hh_l{layer}", init, (g,)),
            ))
        self._lstm = tuple(lstm)

    def __call__(self, depth: Array, pointgoal: Array, prev_actions: Array,
                 hidden: Array, masks: Array) -> Tuple[Array, Array]:
        """depth [B,256,256,1], pointgoal [B,2] (rho, phi), prev_actions
        [B] int, hidden [2*num_layers, B, H] (h rows then c rows), masks
        [B,1]. Returns (features [B,H], new_hidden)."""
        rho, phi = pointgoal[:, 0], pointgoal[:, 1]
        goal = jnp.stack([rho, jnp.cos(-phi), jnp.sin(-phi)], axis=-1)
        tw, tb = self._tgt
        tgt = goal @ tw.T + tb

        prev_idx = ((prev_actions.astype(jnp.float32) + 1.0)
                    * masks.reshape(-1)).astype(jnp.int32)
        prev = self.prev_action_embedding(prev_idx)

        vis = self.visual_encoder(depth)
        vis = jnp.transpose(vis, (0, 3, 1, 2)).reshape(vis.shape[0], -1)
        vw, vb = self._visual_fc
        vis = nn.relu(vis @ vw.T + vb)

        x = jnp.concatenate([vis, tgt, prev], axis=1)
        m = masks.reshape(-1, 1)
        hs = hidden[: self.num_layers] * m
        cs = hidden[self.num_layers:] * m
        new_h, new_c = [], []
        for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(self._lstm):
            h, c = lstm_cell(x, hs[layer], cs[layer], w_ih, w_hh, b_ih, b_hh)
            new_h.append(h)
            new_c.append(c)
            x = h
        return x, jnp.concatenate(
            [jnp.stack(new_h), jnp.stack(new_c)], axis=0)


class PointNavResNetPolicy(nn.Module):
    hidden_size: int = 512
    num_actions: int = 4

    def setup(self):
        self.net = PointNavResNetNet(self.hidden_size, self.num_actions,
                                     name="net")
        self.action_linear = tdense(self.hidden_size, self.num_actions,
                                    name="action_distribution.linear")
        self.critic_fc = nn.Dense(1, name="critic.fc")

    def act(self, depth, pointgoal, prev_actions, hidden, masks):
        feats, hidden = self.net(depth, pointgoal, prev_actions, hidden, masks)
        logits = self.action_linear(feats)
        value = self.critic_fc(feats)
        action = jnp.argmax(logits, axis=-1)
        return action, logits, value, hidden


class DdppoController:
    """Host-side stateful adapter mirroring `DdppoPolicy.plan/reset`
    (`ddppo_policy.py:57-81`); one instance per env."""

    def __init__(self, variables: Optional[Dict] = None, seed: int = 0,
                 hidden_size: int = 512):
        self.policy = PointNavResNetPolicy(hidden_size)
        if variables is None:
            variables = self.policy.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 256, 256, 1)), jnp.zeros((1, 2)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((4, 1, hidden_size)), jnp.ones((1, 1)),
                method=PointNavResNetPolicy.act)
        self.variables = variables
        self.hidden_size = hidden_size
        self._jit_act = jax.jit(
            lambda v, d, g, p, h, m: self.policy.apply(
                v, d, g, p, h, m, method=PointNavResNetPolicy.act))
        self.reset()

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "DdppoController":
        from ws_mgmap_tpu.utils.convert import import_torch_state, load_torch_checkpoint

        ctrl = cls()
        raw = load_torch_checkpoint(path)
        sd = {k[len("actor_critic."):]: v for k, v in raw.items()
              if k.startswith("actor_critic.")}
        ctrl.variables, missing, _ = import_torch_state(ctrl.variables, sd)
        return ctrl

    def reset(self):
        self.hidden = jnp.zeros((4, 1, self.hidden_size))
        self.prev_action = jnp.zeros((1,), jnp.int32)

    def plan(self, depth, pointgoal, t: int) -> int:
        """depth [256,256,1] (or [H,W]), pointgoal [2] (rho, phi)."""
        d = np.asarray(depth, np.float32).reshape(1, 256, 256, 1)
        g = np.asarray(pointgoal, np.float32).reshape(1, 2)
        masks = jnp.zeros((1, 1)) if t == 0 else jnp.ones((1, 1))
        action, _, _, self.hidden = self._jit_act(
            self.variables, jnp.asarray(d), jnp.asarray(g),
            self.prev_action, self.hidden, masks)
        self.prev_action = action.astype(jnp.int32)
        return int(action[0])
