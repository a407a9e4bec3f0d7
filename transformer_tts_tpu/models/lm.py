"""LSTM language model over discrete dual-token outputs.

Reference: ``Models/LM.py:6-27`` (``Model_lm``) — two embeddings (one per
token stream) summed, a 4-layer unidirectional LSTM, and two softmax
heads. Used for rescoring discrete (VQ) TTS outputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class LSTMLanguageModel(nn.Module):
    vocab_size: int
    hidden_size: int = 512
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens1, tokens2):
        """(B, T) x2 int token streams -> two (B, T, vocab) logit streams."""
        x = (nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name="embed1")(tokens1)
             + nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name="embed2")(tokens2))
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                            dtype=self.dtype),
                       name=f"lstm_{i}")(x)
        logits1 = nn.Dense(self.vocab_size, dtype=self.dtype,
                           name="out1")(x)
        logits2 = nn.Dense(self.vocab_size, dtype=self.dtype,
                           name="out2")(x)
        return logits1, logits2
