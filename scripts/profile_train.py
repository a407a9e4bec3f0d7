"""Where does the 32x1024 FS2 train step spend its ~154 ms?

Ablation profiling with the honest clock (bench_utils.slope_time): each
variant re-times the full jitted train step with one ingredient changed.
Differences between variants attribute wall time to ingredients without
needing a working trace viewer on this platform.

Also attempts a jax.profiler trace capture (written under
docs/traces/ if the platform supports it).

Run: python scripts/profile_train.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rs, b, lt, tt, vocab, mel_dim):
    import jax.numpy as jnp
    return {
        "text": jnp.asarray(rs.randint(1, vocab, (b, lt)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, tt, mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
        "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
    }


def time_variant(name, hp_kwargs, b=32, lt=64, tt=1024, n_long=6,
                 repeats=7, with_flops=False, donate=False):
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.bench_utils import slope_time, xla_flops
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = HParams(**{"amp": True, "batch_size": b, **hp_kwargs})
    rs = np.random.RandomState(0)
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    batch = make_batch(rs, b, lt, tt, hp.vocab_size, hp.mel_dim)
    step_fn = make_fastspeech2_train_step(model, hp, donate=donate)
    # production dropout keys (config.py prng_impl, default rbg) — a
    # threefry key here would re-inflate the dropout cost being measured
    rng = jax.random.key(1, impl=hp.prng_impl)

    def chain(k):
        # donation consumes the input state's buffers — give each chain
        # its own copy (the copy cost cancels in the slope)
        s = jax.tree.map(jnp.copy, state) if donate else state
        logs = None
        for _ in range(k):
            s, logs = step_fn(s, batch, rng)
        return float(logs["loss_total"])

    chain(2)
    tm = slope_time(chain, n_long, repeats=repeats)
    tflops = 0.0
    if with_flops:
        # NOTE: lower().compile() bypasses the jit cache — costs a full
        # extra compile (~100 s on this platform); off by default.
        flops = xla_flops(step_fn, state, batch, rng)
        tflops = flops / tm.per_iter / 1e12 if flops else 0.0
    print(f"{name:40s} {tm.per_iter * 1e3:8.2f} ms/step "
          f"({(b * tt) / tm.per_iter / 1e3:7.1f}k frames/s, "
          f"{tflops:5.1f} TFLOP/s)", flush=True)
    return tm.per_iter


VARIANTS = {
    "baseline": ("baseline amp dropout=0.1", {}),
    "nodrop": ("dropout=0 (all)", dict(
        dropout=0.0, dropout_postnet=0.0, dropout_variance_adaptor=0.0)),
    "nopostnet": ("no postnet", dict(postnet_pred=False)),
    "novariance": ("no pitch/energy", dict(pitch_pred=False,
                                           energy_pred=False)),
    "remat": ("remat", dict(remat=True)),
    "fp32": ("fp32 (amp off)", dict(amp=False)),
    "threefry": ("threefry PRNG, dropout=0.1", dict(
        prng_impl="threefry2x32")),
    "rbg": ("rbg PRNG, dropout=0.1", dict(prng_impl="rbg")),
    "unsafe_rbg": ("unsafe_rbg PRNG, dropout=0.1", dict(
        prng_impl="unsafe_rbg")),
    "t2048": ("bucket 32x2048", {}),
    "b64": ("bucket 64x1024", {}),
    # round-2 structural breakdown of the remaining ~68 ms
    "dec3": ("decoder layers 6->3", dict(n_layer_decoder=3)),
    "enc3": ("encoder layers 6->3", dict(n_layer_encoder=3)),
    "noflash": ("XLA attention (flash off)", dict(
        use_flash_attention=False)),
    "donate": ("donated state buffers", {}),
    "enck1": ("encoder ff kernel 5->1", dict(
        ff_conv_kernel_size_encoder=1)),
    "conformer": ("conformer enc+dec (relative MHA)", dict(
        encoder_type="conformer", decoder_type="conformer")),
}


def main():
    from transformer_tts_tpu.bench_utils import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax

    names = sys.argv[1:] or list(VARIANTS)
    for key in names:
        if key == "trace":
            continue
        label, kwargs = VARIANTS[key]
        shape = {}
        if key == "t2048":
            shape = dict(tt=2048, lt=128, n_long=4)
        elif key == "b64":
            shape = dict(b=64, n_long=4)
        elif key == "donate":
            shape = dict(donate=True)
        time_variant(label, kwargs, **shape)
    if "trace" not in names and sys.argv[1:]:
        return

    # profiler attempt
    trace_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "traces")
    try:
        import jax.numpy as jnp
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            x = jnp.ones((1024, 1024))
            float(jnp.sum(x @ x))
        entries = []
        for root, _dirs, files in os.walk(trace_dir):
            entries += files
        print(f"profiler trace: wrote {len(entries)} file(s) under "
              f"{trace_dir}", flush=True)
    except Exception as e:
        print(f"profiler trace FAILED on this platform: {e}", flush=True)


if __name__ == "__main__":
    main()
