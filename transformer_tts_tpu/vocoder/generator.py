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

import jax.numpy as jnp
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
