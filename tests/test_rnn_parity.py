"""Parity: torch-layout GRU/biLSTM cells vs torch nn.GRU / packed nn.LSTM."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from ws_mgmap_tpu.models.rnn import TorchBiLSTM, TorchGRU
from ws_mgmap_tpu.utils.convert import import_torch_state

torch.manual_seed(1)
RNG = np.random.RandomState(5)


def test_gru_step_and_seq_parity():
    I, H, B, T = 12, 16, 4, 7
    t_gru = torch.nn.GRU(I, H)
    xs = RNG.randn(T, B, I).astype(np.float32)

    with torch.no_grad():
        want, h_t = t_gru(torch.from_numpy(xs))

    f_gru = TorchGRU(I, H)
    template = f_gru.init(
        jax.random.PRNGKey(0), jnp.zeros((B, I)), jnp.zeros((B, H)), jnp.ones((B, 1))
    )
    sd = {k: v.numpy() for k, v in t_gru.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing and not unused

    ys, h_last = f_gru.apply(
        variables,
        jnp.asarray(xs),
        jnp.zeros((B, H)),
        jnp.ones((T, B, 1)),
        method=TorchGRU.seq,
    )
    np.testing.assert_allclose(np.asarray(ys), want.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), h_t[0].numpy(), atol=1e-5, rtol=1e-5)


def test_gru_mask_resets_state():
    I, H, B = 4, 8, 2
    f_gru = TorchGRU(I, H)
    x = jnp.asarray(RNG.randn(B, I).astype(np.float32))
    h = jnp.asarray(RNG.randn(B, H).astype(np.float32))
    v = f_gru.init(jax.random.PRNGKey(1), x, h, jnp.ones((B, 1)))
    out_masked, _ = f_gru.apply(v, x, h, jnp.zeros((B, 1)))
    out_fresh, _ = f_gru.apply(v, x, jnp.zeros((B, H)), jnp.ones((B, 1)))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_fresh), atol=1e-6)


def test_bilstm_packed_parity():
    I, H, B, T = 10, 14, 3, 9
    lengths = np.array([9, 5, 2])
    t_lstm = torch.nn.LSTM(I, H, bidirectional=True)
    xs = RNG.randn(B, T, I).astype(np.float32)
    xs_masked = xs.copy()
    for b, l in enumerate(lengths):
        xs_masked[b, l:] = 0.0

    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(xs_masked), torch.from_numpy(lengths),
            batch_first=True, enforce_sorted=False,
        )
        out_packed, _ = t_lstm(packed)
        want = torch.nn.utils.rnn.pad_packed_sequence(
            out_packed, batch_first=True, total_length=T
        )[0].numpy()

    f_lstm = TorchBiLSTM(I, H)
    template = f_lstm.init(
        jax.random.PRNGKey(0), jnp.zeros((B, T, I)), jnp.asarray(lengths)
    )
    sd = {k: v.numpy() for k, v in t_lstm.state_dict().items()}
    variables, missing, unused = import_torch_state(template, sd)
    assert not missing and not unused

    got = np.asarray(
        f_lstm.apply(variables, jnp.asarray(xs_masked), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # padding positions must be exactly zero (mask derivation depends on it)
    for b, l in enumerate(lengths):
        assert np.all(got[b, l:] == 0.0)
