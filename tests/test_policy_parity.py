"""Full-network parity: flax MGMapNet vs torch mirror (cached-feature path).

Covers everything downstream of the frozen trunks: instruction bi-LSTM,
rgb/depth/map linears (incl. torch channel-first flatten order), map
encoder/decoder/classifier, both attention hops (mask-before-scale order),
both GRUs, and the hidden-state layout.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_mirrors import TorchMGMapNetCached
from ws_mgmap_tpu.models.policy import MGMapConfig, MGMapNet
from ws_mgmap_tpu.utils.convert import import_torch_state

torch.manual_seed(2)
RNG = np.random.RandomState(6)

RENAMES = {
    "embedding_layer.": "instruction_encoder.embedding_layer.",
    "encoder_rnn.": "instruction_encoder.encoder_rnn.",
    "spatial_embeddings.": "depth_encoder.spatial_embeddings.",
    "state_rnn.": "state_encoder.rnn.",
    "second_rnn.": "second_state_encoder.rnn.",
}


def to_reference_keys(sd):
    out = {}
    for k, v in sd.items():
        for old, new in RENAMES.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v.numpy()
    return out


def randomize_bn_stats(module):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def test_mgmapnet_parity_cached_path():
    B, L = 2, 9
    t_net = TorchMGMapNetCached(vocab=100)
    randomize_bn_stats(t_net)
    t_net.eval()

    instruction = np.zeros((B, L), np.int64)
    instruction[0, :7] = RNG.randint(1, 100, 7)
    instruction[1, :4] = RNG.randint(1, 100, 4)
    rgb_features = RNG.randn(B, 512, 7, 7).astype(np.float32)
    depth_features = RNG.randn(B, 128, 4, 4).astype(np.float32)
    ego_map = RNG.rand(B, 64, 100, 100).astype(np.float32)
    hidden = RNG.randn(2, B, 512).astype(np.float32)
    masks = np.array([[1.0], [0.0]], np.float32)

    with torch.no_grad():
        t_feat, t_hidden, t_pred, t_att = t_net(
            torch.from_numpy(instruction),
            torch.from_numpy(rgb_features),
            torch.from_numpy(depth_features),
            torch.from_numpy(ego_map),
            torch.from_numpy(hidden),
            torch.from_numpy(masks),
        )

    cfg = MGMapConfig(vocab_size=100)
    f_net = MGMapNet(cfg)
    obs = {
        "instruction": jnp.asarray(instruction),
        "rgb_features": jnp.asarray(np.transpose(rgb_features, (0, 2, 3, 1))),
        "depth_features": jnp.asarray(np.transpose(depth_features, (0, 2, 3, 1))),
        "rgb_ego_map": jnp.asarray(np.transpose(ego_map, (0, 2, 3, 1))),
    }
    template = f_net.init(
        jax.random.PRNGKey(0), obs, jnp.asarray(hidden), jnp.asarray(masks), False
    )
    variables, missing, unused = import_torch_state(
        template, to_reference_keys(t_net.state_dict())
    )
    assert not missing, missing[:8]
    assert not unused, unused[:8]

    f_feat, f_hidden, f_pred, f_att, _, _ = f_net.apply(
        variables, obs, jnp.asarray(hidden), jnp.asarray(masks), False
    )

    np.testing.assert_allclose(np.asarray(f_feat), t_feat.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_hidden), t_hidden.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_pred), (0, 3, 1, 2)), t_pred.numpy(),
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(f_att), t_att.numpy(), atol=2e-4, rtol=1e-3)


def test_mgmapnet_seq_matches_stepwise():
    """Teacher-forcing scan == running single steps (same params, masks)."""
    cfg = MGMapConfig(vocab_size=50, ego_map_size=20)
    f_net = MGMapNet(cfg)
    T, N, L = 4, 2, 6
    instruction = np.zeros((T * N, L), np.int64)
    instruction[:, :3] = RNG.randint(1, 50, (T * N, 3))
    obs = {
        "instruction": jnp.asarray(instruction),
        "rgb_features": jnp.asarray(RNG.randn(T * N, 7, 7, 512).astype(np.float32)),
        "depth_features": jnp.asarray(RNG.randn(T * N, 4, 4, 128).astype(np.float32)),
        "rgb_ego_map": jnp.asarray(RNG.rand(T * N, 20, 20, 64).astype(np.float32)),
    }
    # episode-major masks [N, T]; 0 at t=0 and one mid-episode reset
    masks = np.ones((N, T), np.float32)
    masks[:, 0] = 0.0
    masks[0, 2] = 0.0

    h0 = jnp.zeros((2, N, 512))
    variables = f_net.init(jax.random.PRNGKey(3), obs, jnp.zeros((2, T * N, 512)),
                           jnp.zeros((T * N, 1)), False)

    obs_nt = {k: jnp.reshape(v, (N, T, *v.shape[1:]))
              for k, v in obs.items()}
    feats_seq, _, att_seq = f_net.apply(
        variables, obs_nt, h0, jnp.asarray(masks), False, method=MGMapNet.seq
    )
    assert feats_seq.shape == (N, T, 512)
    assert att_seq.shape[:2] == (N, T)

    h = h0
    outs = []
    for t in range(T):
        obs_t = {k: v[:, t] for k, v in obs_nt.items()}
        f, h, _, att, _, _ = f_net.apply(
            variables, obs_t, h, jnp.asarray(masks[:, t:t + 1]), False
        )
        outs.append(np.asarray(f))
    want = np.stack(outs, axis=1)  # [N, T, H]
    np.testing.assert_allclose(
        np.asarray(feats_seq), want, atol=1e-5, rtol=1e-5
    )
