"""MGMapNet + BasePolicy — the cross-modal waypoint policy.

TPU-first re-design of `MGMapNet` (`vlnce_baselines/models/mg_map_policy.py:19-251`)
and `BasePolicy` (`vlnce_baselines/models/policy.py:15-103`):

  * all per-frame encoders (UNet / depth ResNet50 / map encoder-decoder) are
    batched dense compute — during teacher forcing they run over the whole
    [T*N] flattened batch in one pass, feeding the MXU with large convs;
  * the recurrent core (GRU1 -> text attention -> map attention -> GRU2)
    stores its parameters in raw torch layout at this module's level, so the
    teacher-forcing path is a single `lax.scan` over time with episode-start
    mask gating — no per-step Python, no lifted transforms;
  * the persistent global map is explicit functional state
    (ops/mapping.rgb_mapping_step), donated on device during rollouts.

Hidden state layout matches the reference: [2, B, 512] with row 0 = GRU1 and
row 1 = GRU2 (`mg_map_policy.py:220-249`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws_mgmap_tpu.models.depth_encoder import VlnResnetDepthEncoder
from ws_mgmap_tpu.models.distributions import CriticHead, DiagGaussian
from ws_mgmap_tpu.models.instruction_encoder import InstructionEncoder
from ws_mgmap_tpu.models.layers import tconv, tdense, torch_bias_init
from ws_mgmap_tpu.models.map_modules import MapClassifier, MapDecoder, MapEncoder
from ws_mgmap_tpu.models.rnn import gru_cell
from ws_mgmap_tpu.models.unet import UNet
from ws_mgmap_tpu.ops.mapping import MapperParams, rgb_mapping_step
from ws_mgmap_tpu.ops.pooling import avg_pool2d_nhwc

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MGMapConfig:
    """Static model hyperparameters (reference `config/default.py:73-141`)."""

    vocab_size: int = 2504
    embedding_size: int = 50
    instr_hidden: int = 128
    rgb_output_size: int = 256
    depth_output_size: int = 128
    # spatial side of the depth trunk output: 4 for the reference's 256^2
    # depth (`resnet_encoders.py:62-70`); smaller testbeds shrink it with
    # the sensor ((H/2)/32 after the input avg-pool + resnet /32)
    depth_spatial: int = 4
    # UNet channel-width multiplier (1.0 = reference arch, required for
    # checkpoint conversion; testbeds shrink it for CPU affordability)
    unet_width: float = 1.0
    map_output_size: int = 256
    ego_map_size: int = 100
    map_depth: int = 64
    hidden_size: int = 512
    input_type: Tuple[str, ...] = ("rgb", "depth", "map")
    num_classes: int = 27
    mapper: MapperParams = MapperParams()

    @classmethod
    def from_config(cls, model_cfg) -> "MGMapConfig":
        m = model_cfg
        return cls(
            vocab_size=m.INSTRUCTION_ENCODER.vocab_size,
            embedding_size=m.INSTRUCTION_ENCODER.embedding_size,
            instr_hidden=m.INSTRUCTION_ENCODER.hidden_size,
            rgb_output_size=m.RGB_ENCODER.output_size,
            depth_output_size=m.DEPTH_ENCODER.output_size,
            depth_spatial=getattr(m.DEPTH_ENCODER, "spatial_hw", 4),
            unet_width=getattr(m.RGB_ENCODER, "unet_width", 1.0),
            map_output_size=m.MAP_ENCODER.output_size,
            ego_map_size=m.MAP_ENCODER.ego_map_size,
            map_depth=m.RGBMAPPING.map_depth,
            hidden_size=m.STATE_ENCODER.hidden_size,
            input_type=tuple(m.STATE_ENCODER.input_type),
            mapper=MapperParams(
                resolution=m.RGBMAPPING.resolution,
                ego_size=m.RGBMAPPING.egocentric_map_size,
                global_size=m.RGBMAPPING.global_map_size,
                map_depth=m.RGBMAPPING.map_depth,
                rotate_in_splat=getattr(m.RGBMAPPING, "rotate_in_splat",
                                        False),
            ),
        )

    @property
    def state_in_size(self) -> int:
        return (
            (self.rgb_output_size if "rgb" in self.input_type else 0)
            + (self.depth_output_size if "depth" in self.input_type else 0)
            + (self.map_output_size if "map" in self.input_type else 0)
        )

    @property
    def second_in_size(self) -> int:
        return self.hidden_size + self.hidden_size // 2 + (
            self.hidden_size // 2 if "map" in self.input_type else 0
        )


class FrameFeatures(NamedTuple):
    """Per-frame (non-recurrent) activations."""

    state_in: Array          # [B, state_in_size]
    map_embedding: Array     # [B, S=24*24, map_output_size]
    text: Array              # [B, L, 2*instr_hidden]
    text_pad: Array          # [B, L] bool, True at pads
    pred_sem_map: Array      # [B, 48, 48, 27] logits
    ego_map: Array           # [B, E, E, map_depth]
    rgb_features: Optional[Array] = None    # UNet bottleneck [B,7,7,512]
    depth_features: Optional[Array] = None  # depth trunk [B,4,4,128]


def _dense_params(mod: nn.Module, name: str, out_f: int, in_f: int):
    w = mod.param(f"{name}.weight", torch_dense_kernel_init_t(out_f, in_f),
                  (out_f, in_f))
    b = mod.param(f"{name}.bias", torch_bias_init(in_f), (out_f,))
    return w, b


def torch_dense_kernel_init_t(out_f: int, in_f: int):
    """torch Linear init on torch-layout [out, in] weights."""

    def init(key, shape, dtype=jnp.float32):
        bound = math.sqrt(2.0 / 6.0) * math.sqrt(3.0 / in_f)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MGMapNet(nn.Module):
    cfg: MGMapConfig

    def setup(self):
        c = self.cfg
        h = c.hidden_size

        self.instruction_encoder = InstructionEncoder(
            vocab_size=c.vocab_size,
            embedding_size=c.embedding_size,
            hidden_size=c.instr_hidden,
            name="instruction_encoder",
        )
        self.rgb_encoder = UNet(width_mult=c.unet_width, name="rgb_encoder")
        self.depth_encoder = VlnResnetDepthEncoder(name="depth_encoder")

        # torch Sequential-index linears (`mg_map_policy.py:38-63,101-109`)
        self._rgb_lin = _dense_params(self, "rgb_linear.2", c.rgb_output_size,
                                      max(8, int(512 * c.unet_width)))
        self._depth_lin = _dense_params(
            self, "depth_linear.1", c.depth_output_size,
            192 * c.depth_spatial ** 2)
        self._map_lin = _dense_params(
            self, "map_linear.2", c.map_output_size, c.map_output_size)

        self.map_encoder = MapEncoder(
            in_channels=c.map_depth, out_channels=c.map_output_size,
            name="map_encoder")
        self.map_decoder = MapDecoder(
            in_channels=c.map_output_size, name="map_decoder")
        self.map_classfier = MapClassifier(
            num_classes=c.num_classes, name="map_classfier")

        self.map_encoded_conv = tconv(
            c.map_output_size, 128, 3, 1, 1, name="map_encoded_linear.0")
        self.map_classified_conv = tconv(
            c.num_classes, 128, 3, 1, 1, name="map_classified_linear.0")
        self.map_cated_conv = tconv(
            256, c.map_output_size, 3, 1, 1, name="map_cated_linear.0")

        # recurrent core — raw torch-layout params so lax.scan is trivial
        def gru(name, in_size):
            g = 3 * h
            bound = 1.0 / math.sqrt(h)
            u = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound)
            return (
                self.param(f"{name}.rnn.weight_ih_l0", u, (g, in_size)),
                self.param(f"{name}.rnn.weight_hh_l0", u, (g, h)),
                self.param(f"{name}.rnn.bias_ih_l0", u, (g,)),
                self.param(f"{name}.rnn.bias_hh_l0", u, (g,)),
            )

        self._gru1 = gru("state_encoder", c.state_in_size)
        self._gru2 = gru("second_state_encoder", h)

        self._q1 = _dense_params(self, "state_text_q_layer", h // 2, h)
        self._k1 = _conv1d_params(self, "state_text_k_layer", h // 2,
                                  2 * c.instr_hidden)
        self._q2 = _dense_params(self, "text_map_q_layer", h // 2,
                                 2 * c.instr_hidden)
        self._k2 = _conv1d_params(self, "text_map_k_layer", h // 2,
                                  c.map_output_size)
        self._compress = _dense_params(
            self, "second_state_compress.0", h, c.second_in_size)

        self._scale = 1.0 / math.sqrt(h // 2)

    # -- frame-level encoders ---------------------------------------------
    def encode_rgb(self, obs: Dict[str, Array]) -> Tuple[Array, Optional[Array]]:
        """Returns (rgb_in [B, 256], proj_feat or None).

        Bypass via cached `rgb_features` mirrors `unet_encoder.py:65-66`.
        """
        if "rgb_features" in obs:
            bottleneck, proj_feat = obs["rgb_features"], None
        else:
            bottleneck, proj_feat, _ = self.rgb_encoder(obs["rgb"], train=False)
        pooled = jnp.mean(bottleneck, axis=(1, 2))  # AdaptiveAvgPool1d(1)
        w, b = self._rgb_lin
        return nn.relu(pooled @ w.T + b), proj_feat, bottleneck

    def encode_depth(self, obs: Dict[str, Array]):
        if "depth_features" in obs:
            x, trunk = self.depth_encoder(cached=obs["depth_features"])
        else:
            x, trunk = self.depth_encoder(depth=obs["depth"])
        # torch flattens channel-first ([B, 192, 4, 4] -> [B, 3072])
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        w, b = self._depth_lin
        return nn.relu(x @ w.T + b), trunk

    def encode_map(self, ego_map: Array, train: bool):
        """ego_map [B,E,E,C] -> (map_in, map_embedding [B,S,256], pred_sem)."""
        enc = self.map_encoder(ego_map, train)                # [B,24,24,256]
        enc_proj = nn.relu(self.map_encoded_conv(enc))        # [B,24,24,128]
        dec = self.map_decoder(enc, train)                    # [B,24,24,64]
        pred_sem = self.map_classfier(dec, train)             # [B,48,48,27]
        cls_proj = nn.relu(
            self.map_classified_conv(avg_pool2d_nhwc(pred_sem, 2, 2)))
        emb = nn.relu(
            self.map_cated_conv(jnp.concatenate([enc_proj, cls_proj], -1)))
        b, hh, ww, cc = emb.shape
        # channels-first flatten order to match torch `flatten(2)`
        map_embedding = emb.reshape(b, hh * ww, cc)
        w, bb = self._map_lin
        map_in = nn.relu(jnp.mean(map_embedding, axis=1) @ w.T + bb)
        return map_in, map_embedding, pred_sem

    def encode_frames(
        self,
        obs: Dict[str, Array],
        train: bool,
        global_map: Optional[Array] = None,
        masks: Optional[Array] = None,
    ) -> Tuple[FrameFeatures, Optional[Array]]:
        """All non-recurrent compute for a batch of frames.

        If `rgb_ego_map` is absent, runs the live mapping path (UNet
        proj-feat -> projection -> registration) and returns the updated
        global map (rollout mode). masks gates episode resets.
        """
        c = self.cfg
        # Bypass via cached text features (RolloutEngine): the instruction
        # is constant within an episode, so the 200-step biLSTM scan — a
        # sequential chain the TPU cannot parallelize — runs once per
        # episode instead of every act (the reference re-encodes per
        # forward, `instruction_encoder.py:45-70`).
        if "text_features" in obs:
            text, text_pad = obs["text_features"], obs["text_pad"]
        else:
            text, text_pad = self.instruction_encoder(obs["instruction"])

        rgb_in, proj_feat, rgb_bottleneck = self.encode_rgb(obs)

        new_global = None
        if "rgb_ego_map" in obs:
            ego_map = obs["rgb_ego_map"]
        else:
            assert global_map is not None and masks is not None
            ego_map, new_global = rgb_mapping_step(
                global_map, proj_feat, obs["depth"], obs["gps"],
                obs["compass"], masks, c.mapper,
            )

        depth_in, depth_trunk = self.encode_depth(obs)
        map_in, map_embedding, pred_sem = self.encode_map(ego_map, train)

        parts = []
        if "rgb" in c.input_type:
            parts.append(rgb_in)
        if "depth" in c.input_type:
            parts.append(depth_in)
        if "map" in c.input_type:
            parts.append(map_in)
        state_in = jnp.concatenate(parts, axis=1)

        return (
            FrameFeatures(state_in, map_embedding, text, text_pad,
                          pred_sem, ego_map, rgb_bottleneck, depth_trunk),
            new_global,
        )

    # -- recurrent core ------------------------------------------------------
    def _core(self, f: FrameFeatures, h1: Array, h2: Array, mask: Array):
        """One decision step (`mg_map_policy.py:209-249`)."""
        c = self.cfg
        w_ih1, w_hh1, b_ih1, b_hh1 = self._gru1
        w_ih2, w_hh2, b_ih2, b_hh2 = self._gru2
        mask = mask.reshape(-1, 1)

        state = gru_cell(f.state_in, h1 * mask, w_ih1, w_hh1, b_ih1, b_hh1)

        qw, qb = self._q1
        kw, kb = self._k1
        q = state @ qw.T + qb                                  # [B, 256]
        k = f.text @ kw.T + kb                                 # [B, L, 256]
        logits = jnp.einsum("nc,nlc->nl", q, k)
        logits = logits - f.text_pad.astype(logits.dtype) * 1e8
        attn = jax.nn.softmax(logits * self._scale, axis=1)
        text_embedding = jnp.einsum("nl,nlc->nc", attn, f.text)

        qw2, qb2 = self._q2
        kw2, kb2 = self._k2
        q2 = text_embedding @ qw2.T + qb2
        k2 = f.map_embedding @ kw2.T + kb2                     # [B, S, 256]
        logits2 = jnp.einsum("nc,nsc->ns", q2, k2)
        att_map = jax.nn.softmax(logits2 * self._scale, axis=1)
        map_att = jnp.einsum("ns,nsc->nc", att_map, f.map_embedding)

        if "map" in c.input_type:
            x = jnp.concatenate([state, text_embedding, map_att], axis=1)
        else:
            x = jnp.concatenate([state, text_embedding], axis=1)
        cw, cb = self._compress
        x = nn.relu(x @ cw.T + cb)
        features = gru_cell(x, h2 * mask, w_ih2, w_hh2, b_ih2, b_hh2)
        return features, state, att_map

    def __call__(
        self,
        obs: Dict[str, Array],
        hidden: Array,
        masks: Array,
        train: bool = False,
        global_map: Optional[Array] = None,
    ):
        """Single decision step. hidden [2,B,H]; returns
        (features, hidden', pred_sem_map, att_map, ego_map, new_global)."""
        frames, new_global = self.encode_frames(obs, train, global_map, masks)
        features, h1, att_map = self._core(frames, hidden[0], hidden[1], masks)
        new_hidden = jnp.stack([h1, features], axis=0)
        return (features, new_hidden, frames.pred_sem_map, att_map,
                frames.ego_map, new_global)

    def seq(self, obs: Dict[str, Array], hidden0: Array, masks: Array,
            train: bool = True):
        """Teacher-forcing forward over an episode-major batch.

        obs leaves are [N, T, ...] (episode-major so a data-parallel shard
        over N survives the [N*T] flatten with no resharding); masks
        [N, T] with 0 at episode starts. Encoders run fully batched over
        all N*T frames; only the tiny recurrent core scans over T.
        Returns (features [N,T,H], pred_sem [N,T,48,48,27], att [N,T,S]).
        """
        n, t_steps = masks.shape[:2]
        flat_obs = {k: v.reshape(n * t_steps, *v.shape[2:])
                    for k, v in obs.items()}
        frames, _ = self.encode_frames(flat_obs, train)

        def split(x):
            # [N*T, ...] -> [T, N, ...] for the time scan
            return jnp.swapaxes(x.reshape(n, t_steps, *x.shape[1:]), 0, 1)

        core_inputs = (
            split(frames.state_in),
            split(frames.map_embedding),
            split(frames.text),
            split(frames.text_pad),
            jnp.swapaxes(masks.reshape(n, t_steps, 1), 0, 1),
        )

        def body(carry, inp):
            h1, h2 = carry
            state_in, map_emb, text, text_pad, m = inp
            f = FrameFeatures(state_in, map_emb, text, text_pad, None, None)
            features, h1_new, att = self._core(f, h1, h2, m)
            return (h1_new, features), (features, att)

        (_, _), (feat_seq, att_seq) = jax.lax.scan(
            body, (hidden0[0], hidden0[1]), core_inputs
        )
        return (
            jnp.swapaxes(feat_seq, 0, 1),
            frames.pred_sem_map.reshape(n, t_steps,
                                        *frames.pred_sem_map.shape[1:]),
            jnp.swapaxes(att_seq, 0, 1),
        )

    def update_map(self, obs: Dict[str, Array], masks: Array,
                   global_map: Array):
        """Map-only step between decisions (`policy.py:30-32`)."""
        _, proj_feat, _ = self.rgb_encoder(obs["rgb"], train=False)
        ego_map, new_global = rgb_mapping_step(
            global_map, proj_feat, obs["depth"], obs["gps"], obs["compass"],
            masks, self.cfg.mapper,
        )
        return ego_map, new_global


def _conv1d_params(mod: nn.Module, name: str, out_f: int, in_f: int):
    """torch Conv1d(k=1) stored as [out, in] (converter squeezes the k dim)."""
    w = mod.param(f"{name}.weight", torch_dense_kernel_init_t(out_f, in_f),
                  (out_f, in_f))
    b = mod.param(f"{name}.bias", torch_bias_init(in_f), (out_f,))
    return w, b


class PolicyOutputs(NamedTuple):
    value: Array
    action: Array
    action_log_probs: Array
    hidden: Array
    prog: Array
    pred_sem_map: Array
    att_map: Array
    ego_map: Array
    global_map: Optional[Array]
    # feature caches for DAgger collection (replaces the reference's
    # forward hooks, `dagger_trainer.py:303-327`)
    rgb_features: Optional[Array] = None
    depth_features: Optional[Array] = None


class BasePolicy(nn.Module):
    """Actor-critic wrapper (`vlnce_baselines/models/policy.py:15-103`)."""

    cfg: MGMapConfig

    def setup(self):
        self.net = MGMapNet(self.cfg, name="net")
        self.action_distribution = DiagGaussian(
            self.cfg.hidden_size, 2, name="action_distribution")
        self.critic = CriticHead(self.cfg.hidden_size, name="critic")
        self.prog_pred = tdense(self.cfg.hidden_size, 1, name="prog_pred")

    def act(
        self,
        obs: Dict[str, Array],
        hidden: Array,
        masks: Array,
        global_map: Optional[Array] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> PolicyOutputs:
        frames, new_global = self.net.encode_frames(
            obs, False, global_map, masks)
        features, h1, att_map = self.net._core(
            frames, hidden[0], hidden[1], masks)
        hidden = jnp.stack([h1, features], axis=0)
        prog = jnp.tanh(self.prog_pred(features))
        dist = self.action_distribution(features)
        value = self.critic(features)
        action = dist.mode() if deterministic else dist.sample(rng)
        return PolicyOutputs(
            value, action, dist.log_probs(action), hidden, prog,
            frames.pred_sem_map, att_map, frames.ego_map, new_global,
            frames.rgb_features, frames.depth_features,
        )

    def update_map(self, obs, masks, global_map):
        return self.net.update_map(obs, masks, global_map)

    def encode_text(self, tokens: Array):
        """(text [B,L,H], text_pad [B,L]) for the per-episode rollout cache
        (see encode_frames' `text_features` bypass)."""
        return self.net.instruction_encoder(tokens)

    def forward_seq(self, obs: Dict[str, Array], hidden0: Array,
                    masks: Array, train: bool = True):
        """Teacher forcing over [N, T, ...] batches (see MGMapNet.seq).

        Returns (pred mean [N,T,2], aux dict with per-frame outputs)."""
        features, pred_sem, att_map = self.net.seq(obs, hidden0, masks, train)
        dist = self.action_distribution(features)
        prog = jnp.tanh(self.prog_pred(features))
        return dist.mean, {
            "features": features,
            "pred_sem_map": pred_sem,
            "att_map": att_map,
            "prog": prog,
        }
