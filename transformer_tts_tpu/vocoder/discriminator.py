"""HiFi-GAN discriminators (training-time only).

* ``MultiPeriodDiscriminator`` — one sub-discriminator per period p in
  (2, 3, 5, 7, 11): the waveform is reshaped to (B, T/p, p, 1) and run
  through a stack of (5,1)-kernel 2-D convs with stride (3,1). Periodic
  structure (pitch harmonics) shows up as columns of the reshape.
* ``MultiScaleDiscriminator`` — three 1-D conv stacks at x1, x2, x4
  average-pooled scales (grouped convs with large kernels).

Both return per-scale (logits, feature-map list) so the trainer can form
the LSGAN adversarial loss and the feature-matching loss. Discriminators
never run at inference, so they stay fp32 by default (GAN training is the
numerically delicate path; the generator carries the bf16 policy).

No reference counterpart (the reference ships no vocoder); hyperparameters
follow the public HiFi-GAN recipe.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn


def _wn(conv: nn.Module, use_weight_norm: bool) -> nn.Module:
    return nn.WeightNorm(conv) if use_weight_norm else conv


class PeriodDiscriminator(nn.Module):
    period: int
    channels: Tuple[int, ...] = (32, 128, 512, 1024)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        # audio: (B, N) -> (B, ceil(N/p), p, 1)
        b, n = audio.shape
        pad = (-n) % self.period
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1).astype(self.dtype)
        fmaps: List[jnp.ndarray] = []
        for i, ch in enumerate(self.channels):
            x = _wn(nn.Conv(ch, (5, 1), strides=(3, 1), padding="SAME",
                            dtype=self.dtype, name=f"conv_{i}"),
                    self.use_weight_norm)(x)
            x = nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        x = _wn(nn.Conv(1024, (5, 1), padding="SAME", dtype=self.dtype,
                        name="conv_penult"), self.use_weight_norm)(x)
        x = nn.leaky_relu(x, 0.1)
        fmaps.append(x)
        x = _wn(nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype,
                        name="conv_out"), self.use_weight_norm)(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        outs = []
        for p in self.periods:
            outs.append(PeriodDiscriminator(
                p, use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name=f"period_{p}")(audio))
        return outs  # list of (logits, fmaps)


class ScaleDiscriminator(nn.Module):
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        # (B, N, 1) conv1d stack, large kernels, grouped middles
        x = audio[..., None].astype(self.dtype)
        cfg = [  # (channels, kernel, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1)]
        fmaps: List[jnp.ndarray] = []
        for i, (ch, k, s, g) in enumerate(cfg):
            x = _wn(nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                            feature_group_count=g, dtype=self.dtype,
                            name=f"conv_{i}"), self.use_weight_norm)(x)
            x = nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        x = _wn(nn.Conv(1, (3,), padding="SAME", dtype=self.dtype,
                        name="conv_out"), self.use_weight_norm)(x)
        fmaps.append(x)
        return x[..., 0], fmaps


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        outs = []
        x = audio
        for i in range(self.num_scales):
            if i > 0:
                # stride-2 average pool (kernel 4, pad SAME), per scale
                x = nn.avg_pool(x[..., None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
            outs.append(ScaleDiscriminator(
                use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                name=f"scale_{i}")(x))
        return outs


class VocoderDiscriminator(nn.Module):
    """MPD + MSD under one param tree (single optimizer target)."""
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    num_scales: int = 3
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        mpd = MultiPeriodDiscriminator(
            self.periods, use_weight_norm=self.use_weight_norm,
            dtype=self.dtype, name="mpd")(audio)
        msd = MultiScaleDiscriminator(
            self.num_scales, use_weight_norm=self.use_weight_norm,
            dtype=self.dtype, name="msd")(audio)
        return mpd + msd
