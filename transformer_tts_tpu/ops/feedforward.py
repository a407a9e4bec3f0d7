"""Feed-forward and Conformer convolution blocks.

* ``ConvFeedForward`` — the reference's Conv1d(d->4d)->ReLU->Conv1d(4d->d)
  FFN with its NON-STANDARD ordering: the residual is added *inside* the
  module, then dropout, then LayerNorm (Models/modules.py:72-88). The caller
  (EncoderLayer) adds a second residual around it — both are load-bearing
  for parity and kept exactly.
* ``ConformerFeedForward`` — LN -> Linear(d->d_ff) -> Swish -> dropout ->
  Linear -> dropout, half-step scaled by the caller (modules.py:166-199).
* ``ConformerConvModule`` — LN -> pointwise(2d)+GLU -> depthwise(k=31) ->
  1x1 -> BatchNorm -> ReLU -> pointwise -> dropout (modules.py:114-164).
  The reference's ``DepthwiseConv`` contains an extra 1x1 conv after the
  depthwise conv (modules.py:154-164) — reproduced here.

Convs are ``nn.Conv`` on (B, T, C) — no transposes; XLA maps these onto the
MXU directly. BatchNorm under pjit data parallelism computes *global* batch
statistics automatically (the logical array spans the mesh), which is the
TPU equivalent of the reference's SyncBatchNorm (train_fastspeech2.py:421).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class ConvFeedForward(nn.Module):
    """residual-inside conv FFN (Models/modules.py:72-88)."""
    d_model: int
    kernel_size: int = 5
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        res = x
        h = nn.Conv(self.d_model * 4, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="f_1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="f_2")(h)
        h = h + res
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(h)


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(x)


class ConformerFeedForward(nn.Module):
    """Macaron half-step FFN (Models/modules.py:166-199)."""
    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(self.d_ff, dtype=self.dtype, name="linear1")(x)
        x = x * nn.sigmoid(x)  # Swish
        x = drop(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)
        return drop(x)


class ConformerConvModule(nn.Module):
    """Conformer convolution module (Models/modules.py:114-164)."""
    d_model: int
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = nn.Conv(self.d_model * 2, (1,), dtype=self.dtype,
                    name="pointwise_conv1")(x)
        out, gate = jnp.split(x, 2, axis=-1)
        x = out * nn.sigmoid(gate)                      # GLU
        x = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.d_model, dtype=self.dtype,
                    name="depthwise_conv")(x)
        x = nn.Conv(self.d_model, (1,), dtype=self.dtype,
                    name="depthwise_out")(x)            # modules.py:159
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="batch_norm")(x)
        x = nn.relu(x)                                  # modules.py:127
        x = nn.Conv(self.d_model, (1,), dtype=self.dtype,
                    name="pointwise_conv2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)
