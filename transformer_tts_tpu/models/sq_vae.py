"""SQ-VAE stochastic quantization codebook.

Reference: ``SQEmbedding`` (Models/modules.py:309-402): Mahalanobis
distances to a learned codebook, Gumbel-softmax soft assignment at train
(temperature annealed by the driver: ``1.0 * exp(-1e-5 * step)``,
train_fastspeech2_sq.py:136-140), ELBO-style loss + codebook perplexity;
deterministic argmin ``encode`` at eval.

Only ``param_var_q='gaussian_1'`` (a single scalar log-variance) is wired
up by the reference models (Models/fastspeech2.py:65, fastspeech2_sq.py);
the gaussian_3/4 variants are kept for completeness.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class SQEmbedding(nn.Module):
    n_embeddings: int
    embedding_dim: int
    param_var_q: str = "gaussian_1"

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.n_embeddings, self.embedding_dim))

    def _distances(self, x_flat, log_var_flat):
        # 0.5 * sum(precision * (e - x)^2) over feature dim
        precision = jnp.exp(-log_var_flat)                    # (N, D) or (1,1)
        diff = self.embedding[None, :, :] - x_flat[:, None, :]  # (N, M, D)
        return 0.5 * jnp.sum(precision[:, None, :] * diff ** 2, axis=-1)

    def _log_var_flat(self, x_flat, log_var_q):
        if self.param_var_q == "gaussian_1":
            return jnp.reshape(log_var_q, (1, 1))
        if self.param_var_q == "gaussian_3":
            return jnp.reshape(log_var_q, (-1, 1))
        if self.param_var_q == "gaussian_4":
            return jnp.reshape(log_var_q, (-1, x_flat.shape[-1]))
        raise ValueError(f"undefined param_var_q: {self.param_var_q}")

    def encode(self, x, log_var_q) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Deterministic nearest-code assignment (modules.py:319-340)."""
        shape = x.shape
        x_flat = x.reshape(-1, self.embedding_dim)
        distances = self._distances(x_flat, self._log_var_flat(
            x_flat, log_var_q))
        indices = jnp.argmin(distances, axis=-1)
        quantized = self.embedding[indices].reshape(shape)
        return quantized, indices.reshape(shape[:-1])

    def __call__(self, x, log_var_q, temperature, rng=None):
        """Stochastic quantization with Gumbel-softmax (modules.py:342-383).

        Returns (quantized, loss, perplexity, indices).
        """
        b, t, _ = x.shape
        x_flat = x.reshape(-1, self.embedding_dim)
        log_var_flat = self._log_var_flat(x_flat, log_var_q)
        distances = self._distances(x_flat, log_var_flat)
        indices = jnp.argmin(distances, axis=-1)

        logits = -distances
        if rng is None:
            rng = self.make_rng("dropout")
        gumbels = jax.random.gumbel(rng, logits.shape)
        encodings = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
        quantized = (encodings @ self.embedding).reshape(x.shape)

        logits_btm = logits.reshape(b, t, self.n_embeddings)
        probs = jax.nn.softmax(logits_btm, axis=-1)
        log_probs = jax.nn.log_softmax(logits_btm, axis=-1)

        precision = jnp.exp(-log_var_q)
        loss = jnp.mean(
            0.5 * jnp.sum(precision * (x - quantized) ** 2, axis=(1, 2))
            + jnp.sum(probs * log_probs, axis=(1, 2)))

        onehot = jax.nn.one_hot(indices, self.n_embeddings)
        avg_probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return quantized, loss, perplexity, indices.reshape(b, t)
