"""Quantify the custom-call FLOP undercount in XLA cost_analysis.

``bench.py``'s ``train_implied_tflops`` divides XLA's own
``cost_analysis()['flops']`` by measured step time. Pallas kernels lower
to ``tpu_custom_call`` — if cost_analysis assigns them zero FLOPs, the
flash-attention matmuls (the O(T^2) term, ~1 TFLOP/step at the 32x1024
parity shape) vanish from the numerator and the reported MFU understates
the machine's actual arithmetic rate.

This script compiles the IDENTICAL FastSpeech2 train step twice —
``use_flash_attention`` on and off — and prints both cost_analysis FLOP
counts plus the analytic attention-FLOP estimate. The delta between the
two compiled counts is what cost_analysis sees for attention on the jnp
path; if the flash variant's count is ~that much lower, the undercount
is confirmed and equals the delta.

Run: python scripts/flops_accounting.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transformer_tts_tpu.bench_utils import (  # noqa: E402
    enable_compilation_cache, xla_flops)


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    b, lt, tt = 32, 64, 1024
    rs = np.random.RandomState(0)
    counts = {}
    for flash in (True, False):
        hp = HParams(amp=True, batch_size=16, use_flash_attention=flash)
        rng = jax.random.PRNGKey(0)
        model, state = init_fastspeech2_state(hp, rng)
        batch = {
            "text": jnp.asarray(
                rs.randint(1, hp.vocab_size, (b, lt)).astype(np.int32)),
            "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
            "mel": jnp.asarray(
                rs.randn(b, tt, hp.mel_dim).astype(np.float32)),
            "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
            "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
            "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
            "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
        }
        step_fn = make_fastspeech2_train_step(model, hp, donate=False)
        step_rng = jax.random.key(1, impl=hp.prng_impl)
        counts[flash] = xla_flops(step_fn, state, batch, step_rng)
        print(f"use_flash={flash}: cost_analysis flops = "
              f"{counts[flash]/1e12:.3f} TFLOP")

    # analytic decoder self-attention FLOPs (fwd QK^T + PV, bwd ~2x fwd
    # with recompute): 6 layers, B=32, H=4, T=1024, d_k=96
    B, H, T, dk, L = 32, 4, 1024, 96, 6
    fwd = 2 * 2 * B * H * T * T * dk * L
    print(f"analytic decoder attn fwd        = {fwd/1e12:.3f} TFLOP")
    print(f"analytic decoder attn fwd+bwd~3x = {3*fwd/1e12:.3f} TFLOP")
    print(f"cost_analysis delta (jnp - flash) = "
          f"{(counts[False]-counts[True])/1e12:.3f} TFLOP")


if __name__ == "__main__":
    main()
