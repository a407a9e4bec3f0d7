"""Vocoder generator benchmark: subpixel vs transposed upsampling, the
iSTFT (Vocos-style) family, and batch throughput (audio-seconds per
wall-second) at the production config (80 mel, 22.05 kHz, hop 256,
V1-size generator).

Run on the chip:  python scripts/vocoder_bench.py [--quick]
Timing: dependency-chained slope (bench_utils.slope_time) — same
methodology as bench.py (README "Timing methodology").
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from transformer_tts_tpu.bench_utils import (
    enable_compilation_cache, slope_time)
from transformer_tts_tpu.vocoder.generator import (
    HiFiGANGenerator, ISTFTVocoder)


def make_generator(mode, dtype):
    if mode == "istft":
        return ISTFTVocoder(dtype=dtype)
    return HiFiGANGenerator(upsample_mode=mode, dtype=dtype)


def bench(mode, batch, frames, dtype, repeats):
    gen = make_generator(mode, dtype)
    mel = jnp.zeros((batch, frames, 80), jnp.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)

    @jax.jit
    def fn(params, mel, carry):
        wav = gen.apply(params, mel + carry * 0)
        return jnp.sum(wav)

    def chain(k):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            carry = fn(params, mel, carry)
        return float(carry)

    chain(1)                                   # compile
    r = slope_time(chain, 8, repeats=repeats)
    ms = r.per_iter * 1e3
    hop = gen.hop_length
    audio_s = batch * frames * hop / 22050.0
    n_params = sum(x.size for x in jax.tree.leaves(params))
    return {"mode": mode, "batch": batch, "frames": frames,
            "ms": round(ms, 3),
            "single_shot_ms": round(r.t1 * 1e3, 2),
            "audio_s_per_s": round(audio_s / (ms / 1e3), 1),
            "rtf_marginal": round((ms / 1e3) / audio_s, 6),
            "params_m": round(n_params / 1e6, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()
    enable_compilation_cache()
    dtype = jnp.bfloat16
    cases = [("subpixel", 1, 256), ("transposed", 1, 256),
             ("istft", 1, 256),
             ("subpixel", 8, 256), ("transposed", 8, 256),
             ("istft", 8, 256)]
    if not args.quick:
        cases += [("subpixel", 16, 512), ("transposed", 16, 512),
                  ("istft", 16, 512)]
    for mode, b, t in cases:
        print(json.dumps(bench(mode, b, t, dtype, args.repeats)),
              flush=True)


if __name__ == "__main__":
    main()
