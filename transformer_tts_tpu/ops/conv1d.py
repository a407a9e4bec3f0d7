"""1-D convolution as shift-stack + one MXU gemm (im2col).

XLA lowers small-kernel 1-D convs at these shapes through a path that
can run an order of magnitude below the achievable gemm rate — measured
on-chip at the (32, 1024) production shape (scripts/mxu_ab.py, fwd,
chained-slope clock):

    k=3 384->256 SAME : nn.Conv 0.653 ms  vs  im2col 0.129 ms
    k=3 256->256 SAME : nn.Conv 1.486 ms  vs  im2col 0.235 ms

``MXUConv1D`` computes the identical convolution as an explicit
zero-pad, k shifted views stacked on the feature axis, and a single
(B*T, k*Cin) x (k*Cin, Cout) matmul — the shape the MXU wants. The
parameter layout is exactly ``flax.linen.Conv``'s (kernel (k, Cin,
Cout), bias (Cout,)), so modules can swap implementations without any
checkpoint or torch-import change (compat/torch_import.py maps torch
Conv1d weights onto this same layout).

The stacked views cost (k-1) extra copies of x in HBM traffic — at
k in {3, 5} that is far below the time XLA's conv lowering loses.
Like every hot-path candidate, the swap was kept only after a full
train-step A/B on the chip (docs/PERF_NOTES.md round-5 section).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import flax.linen as nn


class MXUConv1D(nn.Module):
    """Drop-in for ``nn.Conv(features, (kernel_size,), padding=...)`` on
    (B, T, C) inputs, stride 1, computed as one gemm.

    ``padding``: "SAME" or an explicit ((left, right),) tuple — the two
    forms the TTS models use (variance predictors use SAME,
    varianceadaptor.py:196-205; postnet uses causal ((4,0),),
    postnets.py:24-36).
    """
    features: int
    kernel_size: int
    padding: Union[str, Tuple[Tuple[int, int], ...]] = "SAME"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, cin, self.features))
        if self.padding == "SAME":
            left = (k - 1) // 2
            right = k - 1 - left
        else:
            ((left, right),) = self.padding
        x = x.astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        t_out = xp.shape[1] - (k - 1)
        # k shifted views stacked on the feature axis: output position t
        # sees input rows t..t+k-1 of the padded sequence, matching the
        # conv's tap order, so the gemm contracts over (tap, cin) in the
        # same (k, Cin, Cout) kernel layout as nn.Conv
        cols = jnp.concatenate(
            [xp[:, i:i + t_out] for i in range(k)], axis=-1)
        w = kernel.astype(self.dtype).reshape(k * cin, self.features)
        y = cols @ w
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y
