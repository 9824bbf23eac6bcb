"""Recurrent cells with torch parameter layout, driven by lax.scan.

Replaces the reference's cuDNN RNNs:
  * instruction bi-LSTM with pack_padded semantics
    (`instruction_encoder.py:80-92`) -> masked forward/backward scans,
  * habitat `RNNStateEncoder` GRUs (`mg_map_policy.py:118-123,147-152`) ->
    mask-gated cells; the sequence form multiplies the hidden state by the
    episode-start mask each step, which is mathematically what habitat's
    segment-splitting cuDNN trick computes.

Parameters are stored exactly in torch layout (``weight_ih_l0`` [G*H, I],
``weight_hh_l0`` [G*H, H], ``bias_*_l0`` [G*H], plus ``_reverse`` variants),
gate order GRU=(r,z,n), LSTM=(i,f,g,o), so released checkpoints convert
verbatim.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _uniform_init(hidden: int):
    bound = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gru_cell(x: Array, h: Array, w_ih: Array, w_hh: Array,
             b_ih: Array, b_hh: Array) -> Array:
    """torch GRUCell math; x [B,I], h [B,H], weights [3H,*] (r,z,n)."""
    hsz = h.shape[-1]
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    r = jax.nn.sigmoid(gi[:, :hsz] + gh[:, :hsz])
    z = jax.nn.sigmoid(gi[:, hsz:2 * hsz] + gh[:, hsz:2 * hsz])
    n = jnp.tanh(gi[:, 2 * hsz:] + r * gh[:, 2 * hsz:])
    return (1.0 - z) * n + z * h


def lstm_cell(x: Array, h: Array, c: Array, w_ih: Array, w_hh: Array,
              b_ih: Array, b_hh: Array) -> Tuple[Array, Array]:
    """torch LSTMCell math; gates (i,f,g,o)."""
    hsz = h.shape[-1]
    g = x @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    i = jax.nn.sigmoid(g[:, :hsz])
    f = jax.nn.sigmoid(g[:, hsz:2 * hsz])
    gg = jnp.tanh(g[:, 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(g[:, 3 * hsz:])
    c_new = f * c + i * gg
    return o * jnp.tanh(c_new), c_new


class TorchGRU(nn.Module):
    """Single-layer GRU with torch params; exposes step and masked-seq."""

    input_size: int
    hidden_size: int

    def setup(self):
        g = 3 * self.hidden_size
        init = _uniform_init(self.hidden_size)
        self.weight_ih_l0 = self.param("weight_ih_l0", init, (g, self.input_size))
        self.weight_hh_l0 = self.param("weight_hh_l0", init, (g, self.hidden_size))
        self.bias_ih_l0 = self.param("bias_ih_l0", init, (g,))
        self.bias_hh_l0 = self.param("bias_hh_l0", init, (g,))

    def __call__(self, x: Array, h: Array, mask: Array) -> Tuple[Array, Array]:
        """One step: h' = cell(x, h * mask). x [B,I], h [B,H], mask [B,1]."""
        h = h * mask.reshape(-1, 1)
        h_new = gru_cell(x, h, self.weight_ih_l0, self.weight_hh_l0,
                         self.bias_ih_l0, self.bias_hh_l0)
        return h_new, h_new

    def seq(self, xs: Array, h0: Array, masks: Array) -> Tuple[Array, Array]:
        """Scan over time. xs [T,B,I], h0 [B,H], masks [T,B,1] ->
        (outputs [T,B,H], h_T)."""
        w_ih, w_hh = self.weight_ih_l0, self.weight_hh_l0
        b_ih, b_hh = self.bias_ih_l0, self.bias_hh_l0

        def body(h, inp):
            x, m = inp
            h = h * m.reshape(-1, 1)
            h = gru_cell(x, h, w_ih, w_hh, b_ih, b_hh)
            return h, h

        h_t, ys = jax.lax.scan(body, h0, (xs, masks))
        return ys, h_t


class TorchBiLSTM(nn.Module):
    """Single-layer bidirectional LSTM with pack_padded_sequence semantics.

    Output at t < length is [fwd_h_t ; bwd_h_t] where the backward pass
    starts at the true last token of each sample; outputs at t >= length are
    zero (torch pad_packed_sequence), matching the reference's padding mask
    derivation (`instruction_encoder.py:92-93`).
    """

    input_size: int
    hidden_size: int

    def setup(self):
        g = 4 * self.hidden_size
        init = _uniform_init(self.hidden_size)
        self.weight_ih_l0 = self.param("weight_ih_l0", init, (g, self.input_size))
        self.weight_hh_l0 = self.param("weight_hh_l0", init, (g, self.hidden_size))
        self.bias_ih_l0 = self.param("bias_ih_l0", init, (g,))
        self.bias_hh_l0 = self.param("bias_hh_l0", init, (g,))
        self.weight_ih_l0_reverse = self.param(
            "weight_ih_l0_reverse", init, (g, self.input_size))
        self.weight_hh_l0_reverse = self.param(
            "weight_hh_l0_reverse", init, (g, self.hidden_size))
        self.bias_ih_l0_reverse = self.param("bias_ih_l0_reverse", init, (g,))
        self.bias_hh_l0_reverse = self.param("bias_hh_l0_reverse", init, (g,))

    def __call__(self, xs: Array, lengths: Array) -> Array:
        """xs [B,T,I], lengths [B] -> outputs [B,T,2H] (zeros beyond length)."""
        b, t, _ = xs.shape
        hsz = self.hidden_size
        step_mask = (jnp.arange(t)[None, :] < lengths[:, None])  # [B,T]

        def run(xs_tbi, w_ih, w_hh, b_ih, b_hh):
            def body(carry, inp):
                h, c = carry
                x, m = inp
                h_new, c_new = lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh)
                m = m[:, None]
                # frozen state past the end of each sequence
                h = jnp.where(m, h_new, h)
                c = jnp.where(m, c_new, c)
                return (h, c), h_new

            init = (jnp.zeros((b, hsz), xs.dtype), jnp.zeros((b, hsz), xs.dtype))
            _, ys = jax.lax.scan(body, init, (xs_tbi, step_mask.T))
            return ys  # [T,B,H]

        fwd = run(jnp.swapaxes(xs, 0, 1), self.weight_ih_l0,
                  self.weight_hh_l0, self.bias_ih_l0, self.bias_hh_l0)
        fwd = jnp.swapaxes(fwd, 0, 1)  # [B,T,H]

        # reverse each sample's valid prefix: rev[t] = x[len-1-t] (clipped)
        idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(t)[None, :], 0, t - 1)
        xs_rev = jnp.take_along_axis(xs, idx[..., None], axis=1)
        bwd_rev = run(jnp.swapaxes(xs_rev, 0, 1), self.weight_ih_l0_reverse,
                      self.weight_hh_l0_reverse, self.bias_ih_l0_reverse,
                      self.bias_hh_l0_reverse)
        bwd_rev = jnp.swapaxes(bwd_rev, 0, 1)  # [B,T,H] in reversed order
        bwd = jnp.take_along_axis(bwd_rev, idx[..., None], axis=1)

        out = jnp.concatenate([fwd, bwd], axis=-1)
        return jnp.where(step_mask[..., None], out, 0.0)


class RNNStateEncoder(nn.Module):
    """habitat `RNNStateEncoder` (GRU, 1 layer) with mask-gated hidden state.

    Torch key prefix: ``<name>.rnn.*`` (habitat stores the GRU under
    ``self.rnn``).
    """

    input_size: int
    hidden_size: int

    def setup(self):
        self.rnn = TorchGRU(self.input_size, self.hidden_size, name="rnn")

    def __call__(self, x: Array, h: Array, masks: Array) -> Tuple[Array, Array]:
        return self.rnn(x, h, masks)

    def seq(self, xs: Array, h0: Array, masks: Array) -> Tuple[Array, Array]:
        return self.rnn.seq(xs, h0, masks)
