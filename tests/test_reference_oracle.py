"""Parity against the reference's OWN torch modules (not hand mirrors).

torch-cpu is installed; `tests/reference_shims.py` shims torch_scatter and
habitat so `vlnce_baselines/common/{rgb_mapping,aux_losses,distributions}.py`
and `models/encoders/instruction_encoder.py` import and run unmodified as
oracles. This replaces mirror-only coverage for these modules.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_shims import (MappingConfig, cpu_as_cuda,
                                   load_reference_module)

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------------------
# rgb_mapping: the full projection + registration hot path
# ---------------------------------------------------------------------------
def test_rgb_mapping_chain_vs_reference():
    ref = load_reference_module("vlnce_baselines/common/rgb_mapping.py")
    from ws_mgmap_tpu.ops.mapping import (MapperParams, init_global_map,
                                          rgb_mapping_step)

    B, steps = 2, 3
    p = MapperParams()
    with cpu_as_cuda():
        mapper = ref.RGBMapping(MappingConfig(num_proc=B))

    gmap = init_global_map(B, p)
    torch.manual_seed(0)

    for t in range(steps):
        feats = RNG.randn(B, 64, 224, 224).astype(np.float32)
        depth = (RNG.rand(B, 256, 256, 1) * 0.6 + 0.05).astype(np.float32)
        gps = RNG.uniform(-3.0, 3.0, (B, 2)).astype(np.float32)
        compass = RNG.uniform(-np.pi, np.pi, (B, 1)).astype(np.float32)
        masks = np.ones((B, 1), np.float32)
        if t == 0:
            masks[:] = 0.0  # episode start clears the map

        obs_t = {
            "gps": torch.from_numpy(gps),
            "depth": torch.from_numpy(depth),
            "compass": torch.from_numpy(compass),
        }
        with torch.no_grad(), cpu_as_cuda():
            want_ego = mapper.forward(
                torch.from_numpy(feats), obs_t, torch.from_numpy(masks)
            ).numpy()
            want_gmap = mapper.full_global_map.numpy()

        got_ego, gmap = rgb_mapping_step(
            gmap,
            jnp.asarray(np.transpose(feats, (0, 2, 3, 1))),
            jnp.asarray(depth),
            jnp.asarray(gps),
            jnp.asarray(compass),
            jnp.asarray(masks),
            p,
        )
        got_ego_nchw = np.transpose(np.asarray(got_ego), (0, 3, 1, 2))

        scale = max(np.abs(want_ego).max(), 1.0)
        np.testing.assert_allclose(
            got_ego_nchw / scale, want_ego / scale, atol=2e-4,
            err_msg=f"ego map mismatch at step {t}")
        np.testing.assert_allclose(
            np.asarray(gmap) / scale, want_gmap / scale, atol=2e-4,
            err_msg=f"global map mismatch at step {t}")


def test_projection_only_vs_reference():
    """`Projection.forward` (pinhole -> scatter_max -> rotate) in isolation."""
    ref = load_reference_module("vlnce_baselines/common/rgb_mapping.py")
    from ws_mgmap_tpu.ops.projection import project_egocentric

    B = 2
    with cpu_as_cuda():
        proj = ref.Projection(100, 240, torch.device("cpu"), -14.4, 14.4)

    feats = RNG.randn(B, 64, 224, 224).astype(np.float32)
    depth_m = (RNG.rand(B, 256, 256, 1) * 6.0).astype(np.float32)
    heading = RNG.uniform(-np.pi, np.pi, (B, 1)).astype(np.float32)

    with torch.no_grad():
        want = proj.forward(
            torch.from_numpy(feats),
            torch.from_numpy(depth_m),
            torch.from_numpy(heading),
        ).numpy()

    got = project_egocentric(
        jnp.asarray(np.transpose(feats, (0, 2, 3, 1))),
        jnp.asarray(depth_m),
        jnp.asarray(heading.reshape(-1)),
        ego_size=100, local_scale=0.12,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


# ---------------------------------------------------------------------------
# aux_losses: registry reduce semantics
# ---------------------------------------------------------------------------
def test_aux_losses_reduce_vs_reference():
    ref = load_reference_module("vlnce_baselines/common/aux_losses.py")
    from ws_mgmap_tpu.train.losses import reduce_aux

    B = 12
    a = RNG.randn(B).astype(np.float32) ** 2
    b = RNG.randn(B).astype(np.float32) ** 2
    c = RNG.randn(B).astype(np.float32) ** 2
    mask = (RNG.rand(B) > 0.4).astype(np.float32)

    reg = ref._AuxLosses()
    reg.activate()
    reg.register_loss("prediction_monitor", torch.from_numpy(a), 0.1)
    reg.register_loss("contrastive_monitor", torch.from_numpy(b), 1.0)
    reg.register_loss("progress_monitor", torch.from_numpy(c), 1.0)
    want = reg.reduce(torch.from_numpy(mask) > 0).item()

    got = float(reduce_aux(
        {
            "prediction_monitor": (jnp.asarray(a), 0.1),
            "contrastive_monitor": (jnp.asarray(b), 1.0),
            "progress_monitor": (jnp.asarray(c), 1.0),
        },
        jnp.asarray(mask),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# distributions: DiagGaussian head
# ---------------------------------------------------------------------------
def test_diag_gaussian_vs_reference():
    ref = load_reference_module("vlnce_baselines/common/distributions.py")
    from ws_mgmap_tpu.models.distributions import DiagGaussian
    from ws_mgmap_tpu.utils.convert import import_torch_state

    N_IN, N_OUT, B = 24, 2, 5
    torch.manual_seed(3)
    t_head = ref.DiagGaussian(N_IN, N_OUT)
    # make logstd nontrivial
    with torch.no_grad():
        t_head.logstd._bias.copy_(torch.randn_like(t_head.logstd._bias) * 0.3)

    x = RNG.randn(B, N_IN).astype(np.float32)
    actions = RNG.randn(B, N_OUT).astype(np.float32)
    with torch.no_grad():
        dist = t_head(torch.from_numpy(x))
        want_mode = dist.mode().numpy()
        want_lp = dist.log_probs(torch.from_numpy(actions)).numpy()
        want_ent = dist.entropy().numpy()

    f_head = DiagGaussian(N_IN, N_OUT)
    template = f_head.init(jax.random.PRNGKey(0), jnp.zeros((B, N_IN)))
    sd = {k: v.numpy() for k, v in t_head.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing and not unused, (missing, unused)

    got = f_head.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got.mode()), want_mode,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.log_probs(jnp.asarray(actions))),
                               want_lp.reshape(-1), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.entropy()),
                               want_ent.reshape(-1)[: B] if want_ent.ndim
                               else want_ent, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# instruction encoder: embedding + packed biLSTM
# ---------------------------------------------------------------------------
class _IECfg:
    use_pretrained_embeddings = False
    fine_tune_embeddings = False
    vocab_size = 40
    embedding_size = 8
    hidden_size = 12
    rnn_type = "LSTM"
    bidirectional = True
    final_state_only = False


def test_instruction_encoder_vs_reference():
    ref = load_reference_module(
        "vlnce_baselines/models/encoders/instruction_encoder.py")
    from ws_mgmap_tpu.models.instruction_encoder import InstructionEncoder
    from ws_mgmap_tpu.utils.convert import import_torch_state

    torch.manual_seed(11)
    t_enc = ref.InstructionEncoder(_IECfg())

    B, T = 3, 9
    lengths = np.array([9, 6, 2])
    tokens = np.zeros((B, T), np.int64)
    for b, l in enumerate(lengths):
        tokens[b, :l] = RNG.randint(1, 40, l)

    with torch.no_grad():
        want, want_mask = t_enc({"instruction": torch.from_numpy(tokens)})
    want = want.numpy()           # [B, 2H, T]
    want_mask = want_mask.numpy()  # [B, T] True at pads

    f_enc = InstructionEncoder(vocab_size=40, embedding_size=8, hidden_size=12)
    template = f_enc.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    sd = {k: v.numpy() for k, v in t_enc.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing and not unused, (missing, unused)

    got, got_mask = f_enc.apply(variables, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 2, 1)), want, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)
