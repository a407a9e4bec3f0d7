"""HiFi-GAN-family generator, TPU-first.

Architecture follows the HiFi-GAN V1 recipe (Kong et al. 2020): a pre-conv,
a stack of upsample stages each followed by a multi-receptive-field (MRF)
fusion of dilated ResBlocks, and a post-conv + tanh. Two deliberate
TPU-native choices:

* **Layout** is (B, T, C) throughout — flax's native 1-D conv layout, which
  XLA tiles onto the MXU without transposes.
* **Upsampling** defaults to *subpixel* (a stride-1 conv producing ``C*r``
  channels followed by depth-to-space), which lowers to a single dense
  matmul-like conv instead of the input-dilated convolution XLA uses for
  ``ConvTranspose`` — measurably faster on TPU and free of the
  checkerboard-prone zero-insertion. ``upsample_mode="transposed"`` keeps
  the literal HiFi-GAN parameterization (kernel ``k_u``, stride ``r``) for
  users porting torch checkpoints.

The generator is fully static-shaped: ``T_out = T_in * prod(upsample_rates)``
and ``prod(upsample_rates)`` must equal the mel ``hop_length``.

No reference counterpart (the reference has no vocoder); cited against the
public HiFi-GAN recipe for hyperparameter names only.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def _wn(conv: nn.Module, use_weight_norm: bool) -> nn.Module:
    return nn.WeightNorm(conv) if use_weight_norm else conv


class ResBlock1(nn.Module):
    """MRF residual block: per dilation, (lrelu -> dilated conv ->
    lrelu -> conv) with a residual add (HiFi-GAN ResBlock1)."""
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = _wn(nn.Conv(self.channels, (self.kernel_size,),
                            kernel_dilation=(d,), padding="SAME",
                            dtype=self.dtype, name=f"conv1_{i}"),
                    self.use_weight_norm)(h)
            h = nn.leaky_relu(h, 0.1)
            h = _wn(nn.Conv(self.channels, (self.kernel_size,),
                            padding="SAME", dtype=self.dtype,
                            name=f"conv2_{i}"),
                    self.use_weight_norm)(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """mel (B, T, mel_dim) -> waveform (B, T * prod(upsample_rates)).

    Defaults are the V1 config for 22.05 kHz / hop 256 audio
    (rates 8*8*2*2 = 256).
    """
    mel_dim: int = 80
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_mode: str = "subpixel"          # subpixel | transposed
    subpixel_kernel_size: int = 3
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    @nn.compact
    def __call__(self, mel):
        if self.upsample_mode not in ("subpixel", "transposed"):
            raise ValueError(f"bad upsample_mode {self.upsample_mode!r}")
        x = _wn(nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                        dtype=self.dtype, name="conv_pre"),
                self.use_weight_norm)(mel.astype(self.dtype))
        for i, (r, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, 0.1)
            if self.upsample_mode == "subpixel":
                # stride-1 conv to C*r channels, then depth-to-space:
                # (B, T, r, C) -> (B, T*r, C). One MXU-friendly conv.
                x = _wn(nn.Conv(ch * r, (self.subpixel_kernel_size,),
                                padding="SAME", dtype=self.dtype,
                                name=f"up_{i}"),
                        self.use_weight_norm)(x)
                b, t, _ = x.shape
                x = x.reshape(b, t * r, ch)
            else:
                x = _wn(nn.ConvTranspose(ch, (k,), strides=(r,),
                                         padding="SAME", dtype=self.dtype,
                                         name=f"up_{i}"),
                        self.use_weight_norm)(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                h = ResBlock1(ch, rk, tuple(rd),
                              use_weight_norm=self.use_weight_norm,
                              dtype=self.dtype, name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = nn.leaky_relu(x, 0.1)
        x = _wn(nn.Conv(1, (7,), padding="SAME", dtype=self.dtype,
                        name="conv_post"), self.use_weight_norm)(x)
        # waveform in fp32 regardless of compute dtype
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


class ConvNeXtBlock(nn.Module):
    """depthwise conv (k) -> LayerNorm -> pointwise MLP, layer-scaled
    residual — the Vocos backbone block. The MLP is the FLOPs body and
    is pure MXU matmul; the depthwise conv is a thin VPU pass."""
    channels: int
    mlp_dim: int
    kernel_size: int = 7
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (self.kernel_size,),
                    feature_group_count=self.channels, padding="SAME",
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.channels, dtype=self.dtype, name="pw2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.channels,), jnp.float32)
        return x + gamma.astype(h.dtype) * h


class ISTFTVocoder(nn.Module):
    """mel (B, T, mel_dim) -> waveform (B, T * hop_length), iSTFT head.

    Vocos-recipe alternative to time-domain upsampling (Siuzdak 2023,
    hyperparameter names only): the ConvNeXt backbone runs at FRAME rate
    — ``hop_length``× fewer conv positions than HiFiGAN's upsampled
    stacks — and the head predicts a per-frame log-magnitude + phase
    spectrum; synthesis is one ``irfft`` + windowed overlap-add (dense
    XLA FFT + scatter-add, both cheap next to the backbone). Trains
    under the same GAN step as HiFiGANGenerator (waveform-in,
    waveform-out contract).

    Streaming: ``receptive_field_radius_frames`` covers the backbone's
    conv stack plus the iSTFT overlap-add span, so
    ``infer.streaming.StreamingVocoder`` windows are exact.
    """
    mel_dim: int = 80
    channels: int = 512
    mlp_dim: int = 1536
    num_layers: int = 8
    kernel_size: int = 7
    n_fft: int = 1024
    hop_length: int = 256
    dtype: jnp.dtype = jnp.float32

    @property
    def receptive_field_radius_frames(self) -> int:
        # embed conv + one dwconv per block, all at frame rate, plus the
        # OLA span (frames whose irfft touches a sample) and its wsum
        # edge region
        return ((self.kernel_size // 2) * (self.num_layers + 1)
                + self.n_fft // self.hop_length)

    @nn.compact
    def __call__(self, mel):
        from transformer_tts_tpu.ops.melspectrogram import _istft
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="embed")(mel.astype(self.dtype))
        x = nn.LayerNorm(dtype=self.dtype, name="norm_pre")(x)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(self.channels, self.mlp_dim,
                              self.kernel_size, dtype=self.dtype,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_post")(x)
        # head + synthesis in fp32: phase wrap and OLA normalization are
        # the numerically delicate path
        h = nn.Dense(self.n_fft + 2, dtype=jnp.float32,
                     name="head")(x.astype(jnp.float32))
        n_bins = self.n_fft // 2 + 1
        # clip log-magnitude: an untrained head can emit exp-overflow
        logmag = jnp.clip(h[..., :n_bins], -1e2, 7.0)
        phase = h[..., n_bins:]
        spec = jnp.exp(logmag) * jax.lax.complex(
            jnp.cos(phase), jnp.sin(phase))
        window = jnp.asarray(np.hanning(self.n_fft + 1)[:-1], jnp.float32)
        return _istft(spec, self.n_fft, self.hop_length, window,
                      mel.shape[1] * self.hop_length)
