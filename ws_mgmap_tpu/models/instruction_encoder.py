"""Instruction encoder: pretrained embedding + bidirectional LSTM.

Re-design of `InstructionEncoder`
(`vlnce_baselines/models/encoders/instruction_encoder.py:10-93`): GloVe-like
embeddings (vocab 2504 x 50, loaded from ``embeddings.json.gz``) feed a
1-layer bi-LSTM(50 -> 128); returns per-token features [B, T, 256] and a
padding mask (True at pads). Token id 0 is PAD; lengths are derived as
``(tokens != 0).sum`` exactly like the reference (`:77`).
"""
from __future__ import annotations

import gzip
import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ws_mgmap_tpu.models.rnn import TorchBiLSTM

Array = jax.Array


def load_pretrained_embeddings(path: str) -> np.ndarray:
    """Load the dataset's embeddings.json.gz (reference `:55-66`)."""
    with gzip.open(path, "rt") as f:
        return np.asarray(json.load(f), dtype=np.float32)


class InstructionEncoder(nn.Module):
    vocab_size: int = 2504
    embedding_size: int = 50
    hidden_size: int = 128
    rnn_type: str = "LSTM"
    bidirectional: bool = True
    final_state_only: bool = False

    @property
    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(self, tokens: Array) -> Tuple[Array, Array]:
        """tokens [B, T] int -> (features [B, T, 2H], pad_mask [B, T])."""
        assert self.rnn_type == "LSTM" and self.bidirectional, (
            "reference configuration is a bidirectional LSTM "
            "(config/default.py:94,96)"
        )
        tokens = tokens.astype(jnp.int32)
        lengths = jnp.sum(tokens != 0, axis=1)
        embedded = nn.Embed(
            self.vocab_size, self.embedding_size,
            embedding_init=nn.initializers.normal(1.0),
            name="embedding_layer",
        )(tokens)
        out = TorchBiLSTM(
            self.embedding_size, self.hidden_size, name="encoder_rnn"
        )(embedded, lengths)
        pad_mask = jnp.arange(tokens.shape[1])[None, :] >= lengths[:, None]
        return out, pad_mask
