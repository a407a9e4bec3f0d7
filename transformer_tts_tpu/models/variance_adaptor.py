"""Variance adaptor: duration / pitch / energy prediction + length regulation.

Reference: ``Models/varianceadaptor.py:34-231``.

* ``VariancePredictor``: Conv1d(k=3) -> ReLU -> LayerNorm -> dropout, x2,
  then Dense -> scalar per position, masked-filled with 0.
* Duration: teacher-forced at train (d_target); at inference
  ``clamp(round(exp(logd) - log_offset), 0)`` with optional x{0.8..1.2}
  perturbation, then length regulation.
* Pitch: predicted per frame; bucketized into log-spaced bins
  (``exp(linspace(log f0_min, log f0_max, nbins-1))``) -> Embedding(nbins).
  Teacher-forced target at train, with per-utterance scheduled sampling at
  probability ``p_scheduled_sampling`` (varianceadaptor.py:261-283).
* Energy: same with linear bins.
* Returns the pre-pitch/energy expanded features as ``text_dur_predicted``
  (consumed by the post-processing models).

The length regulator is the vectorized cumsum-gather of
``ops/length_regulator.py`` — the reference's per-utterance Python loop
(varianceadaptor.py:131-184) is the #1 TPU-hostile construct not ported.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.ops.length_regulator import (
    length_regulate, durations_from_log)
from transformer_tts_tpu.ops.positional import PositionalEncoder


class VariancePredictor(nn.Module):
    """Conv-ReLU-LN-dropout x2 -> Dense(1) (varianceadaptor.py:186-231)."""
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv1")(x)
        h = drop(nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(
            nn.relu(h)))
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        h = drop(nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(
            nn.relu(h)))
        out = nn.Dense(1, dtype=self.dtype, name="linear_layer")(h)[..., 0]
        if mask is not None:
            # mask: (B, 1, T) attend-mask; fill non-attended with 0
            out = jnp.where(mask[:, 0, :], out, 0.0)
        return out


class VarianceAdaptorOutput(NamedTuple):
    x: jnp.ndarray                      # (B, T_mel, D) + pitch/energy emb
    log_duration: jnp.ndarray           # (B, L)
    pitch: Optional[jnp.ndarray]        # (B, T_mel)
    energy: Optional[jnp.ndarray]       # (B, T_mel)
    mel_len: jnp.ndarray                # (B,)
    mel_pos: jnp.ndarray                # (B, T_mel) 1-based, 0 = pad
    mel_mask: jnp.ndarray               # (B, 1, T_mel)
    text_dur_predicted: jnp.ndarray     # expanded features pre-pitch/energy


class VarianceAdaptor(nn.Module):
    d_model: int
    n_bins: int = 256
    f0_min: float = 71.0
    f0_max: float = 795.8
    energy_min: float = 0.0
    energy_max: float = 315.0
    log_offset: float = 1.0
    pitch_pred: bool = True
    energy_pred: bool = True
    dropout: float = 0.5
    use_pos: bool = False
    use_rnn_length: bool = False
    # optional (mean, std): the predictor then works in STANDARDIZED
    # units (its raw output and the returned ``pitch``/``energy`` are
    # (v - mean) / std; losses must standardize their targets the same
    # way — losses.fastspeech2_loss does when given the stats) and is
    # de-standardized here before the bucketized embedding lookup.
    # None = exact reference semantics (raw-Hz / raw-energy L1).
    f0_stats: Optional[tuple] = None
    energy_stats: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _destandardize(v, stats):
        if stats is None:
            return v
        mean, std = stats
        return v * std + mean

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        src_mask: jnp.ndarray,
        max_frames: int,
        duration_target: Optional[jnp.ndarray] = None,
        pitch_target: Optional[jnp.ndarray] = None,
        energy_target: Optional[jnp.ndarray] = None,
        mel_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        p_scheduled_sampling: float = 0.0,
        pitch_scale: float = 1.0,
        duration_scale: float = 1.0,
    ) -> VarianceAdaptorOutput:
        log_d = VariancePredictor(
            dropout=self.dropout, dtype=self.dtype,
            name="duration_predictor")(x, src_mask, train=train)

        if duration_target is not None:
            durations = duration_target.astype(jnp.int32)
        else:
            durations = durations_from_log(
                log_d.astype(jnp.float32), self.log_offset, duration_scale)
            # zero out padded phones so they contribute no frames
            durations = jnp.where(src_mask[:, 0, :], durations, 0)

        x, mel_len, mel_pos = length_regulate(x, durations, max_frames)
        if mel_mask is None:
            mel_mask = (mel_pos != 0)[:, None, :]

        if self.use_pos:  # varianceadaptor.py:86-88
            x = PositionalEncoder(self.d_model, dropout=0.1,
                                  dtype=self.dtype, name="pos")(
                x, train=train)
        if self.use_rnn_length:  # varianceadaptor.py:90-92
            x = _UniLSTM(self.d_model, dtype=self.dtype, name="rnn_length")(x)

        # Both predictors run on the expanded features WITHOUT pitch/energy
        # embeddings; the embeddings are added only at the end, and
        # ``text_dur_predicted`` is the embedding-free tensor
        # (varianceadaptor.py:94-127).
        pitch = energy = None
        pitch_emb = energy_emb = None
        if self.pitch_pred:
            pitch = VariancePredictor(
                dropout=self.dropout, dtype=self.dtype,
                name="pitch_predictor")(x, mel_mask, train=train)
            pitch_bins = jnp.exp(jnp.linspace(
                jnp.log(self.f0_min), jnp.log(self.f0_max), self.n_bins - 1))
            pitch_raw = self._destandardize(pitch, self.f0_stats)
            if pitch_target is not None:
                src = pitch_target
                if p_scheduled_sampling > 0.0 and train:
                    # per-utterance swap to prediction (vadap.py:261-283)
                    rng = self.make_rng("dropout")
                    swap = jax.random.uniform(
                        rng, (x.shape[0], 1)) < p_scheduled_sampling
                    src = jnp.where(swap, pitch_raw, pitch_target)
            else:
                src = pitch_raw * pitch_scale
            idx = jnp.searchsorted(pitch_bins, src)  # == torch.bucketize
            pitch_emb = nn.Embed(self.n_bins, self.d_model, dtype=self.dtype,
                                 name="pitch_embedding")(idx)

        if self.energy_pred:
            energy = VariancePredictor(
                dropout=self.dropout, dtype=self.dtype,
                name="energy_predictor")(x, mel_mask, train=train)
            energy_bins = jnp.linspace(
                self.energy_min, self.energy_max, self.n_bins - 1)
            src = energy_target if energy_target is not None else \
                self._destandardize(energy, self.energy_stats)
            idx = jnp.searchsorted(energy_bins, src)
            energy_emb = nn.Embed(self.n_bins, self.d_model,
                                  dtype=self.dtype,
                                  name="energy_embedding")(idx)

        text_dur_predicted = x
        if pitch_emb is not None:
            x = x + pitch_emb
        if energy_emb is not None:
            x = x + energy_emb
        return VarianceAdaptorOutput(
            x=x, log_duration=log_d, pitch=pitch, energy=energy,
            mel_len=mel_len, mel_pos=mel_pos, mel_mask=mel_mask,
            text_dur_predicted=text_dur_predicted)


class _UniLSTM(nn.Module):
    """Unidirectional LSTM over time via lax.scan (vadap.py:53, use_rnn)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cell = nn.OptimizedLSTMCell(self.features, dtype=self.dtype)
        scan = nn.RNN(cell, name="lstm")
        return scan(x)


class Aligner(nn.Module):
    """Differentiable duration-modeling sketch, made runnable.

    Reference: ``Models/aligner.py:9-46`` — 3x(Conv1d(k=9) + LayerNorm +
    dropout) over encoder features, a Linear to M max-duration logits,
    additive gaussian noise at train, sigmoid output. The reference module
    crashes as shipped (``torch.randn(outputs)`` on a tensor, and its
    sibling ``AutoTTS`` has a ``super.__init__()`` typo); this is the
    working equivalent (the ``convert_s`` duration-matrix conversion was
    ``pass`` upstream and remains future work there too).
    """
    d_model: int
    max_duration: int            # M
    kernel_size: int = 9
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoded, *, train: bool = True):
        x = encoded
        for i in range(3):
            x = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(self.max_duration, dtype=self.dtype, name="out")(x)
        if train:
            noise = jax.random.normal(self.make_rng("dropout"), out.shape)
            out = out + noise.astype(out.dtype)
        return nn.sigmoid(out)
