"""Where does the conformer FS2 train step spend its ~113 ms?

Component attribution by monkeypatch ablation: each variant zeroes one
conformer ingredient (macaron FFNs, conv module, relpos term) and
re-times the full jitted train step with the honest chained-slope
clock. The patched modules keep the call structure (params may shrink)
so the delta attributes wall time to the ingredient. Also reports
XLA cost-analysis FLOPs -> implied TFLOP/s per variant, so "is this
utilization or waste?" is answered directly.

Run: python scripts/conformer_ablate.py [variant ...]
Variants: full noff noconv nodw plainattn enc_transformer transformer
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, T = 32, 64, 1024


def batch_for(rs, hp, jnp):
    return {
        "text": jnp.asarray(rs.randint(1, hp.vocab_size, (B, L)).astype(
            np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, L + 1)[None], (B, 1)),
        "mel": jnp.asarray(rs.randn(B, T, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, T + 1)[None], (B, 1)),
        "alignment": jnp.full((B, L), T // L, jnp.int32),
        "f0": jnp.asarray(rs.rand(B, T).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(B, T).astype(np.float32) * 100),
    }


def time_variant(name, patch=None, hp_kwargs=None, n_long=4, repeats=7):
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.bench_utils import (implied_tflops, slope_time,
                                                 xla_flops)
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = HParams(amp=True, batch_size=B,
                 **(hp_kwargs if hp_kwargs is not None else
                    dict(encoder_type="conformer", decoder_type="conformer")))
    rs = np.random.RandomState(0)
    undo = patch() if patch else None
    try:
        model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
        batch = batch_for(rs, hp, jnp)
        step_fn = make_fastspeech2_train_step(model, hp, donate=False)
        rng = jax.random.key(1, impl=hp.prng_impl)

        def chain(k):
            s, logs = state, None
            for _ in range(k):
                s, logs = step_fn(s, batch, rng)
            return float(logs["loss_total"])

        chain(1)  # compile
        fl = xla_flops(step_fn, state, batch, rng)
        tm = slope_time(chain, n_long, repeats=repeats)
        fps = B * T / tm.per_iter
        print(f"{name:32s} {tm.per_iter * 1e3:7.2f} ms/step "
              f"{fps / 1e3:6.0f}k frames/s "
              f"{fl / 1e9:7.1f} GF  {implied_tflops(fl, tm.per_iter):5.1f} "
              f"TFLOP/s", flush=True)
    finally:
        if undo:
            undo()


def patch_ff():
    """Macaron half-FFNs -> 0 (keeps residual adds)."""
    from transformer_tts_tpu.ops import feedforward as FF
    orig = FF.ConformerFeedForward.__call__

    def zero(self, x, *, train=True):
        return x * 0.0

    FF.ConformerFeedForward.__call__ = zero
    return lambda: setattr(FF.ConformerFeedForward, "__call__", orig)


def patch_conv():
    """Whole conv module -> 0."""
    from transformer_tts_tpu.ops import feedforward as FF
    orig = FF.ConformerConvModule.__call__

    def zero(self, x, *, train=True):
        return x * 0.0

    FF.ConformerConvModule.__call__ = zero
    return lambda: setattr(FF.ConformerConvModule, "__call__", orig)


def patch_dw():
    """Only the k=31 depthwise conv -> identity (pointwise convs, GLU,
    BN kept)."""
    import flax.linen as nn
    orig = nn.Conv.__call__

    def maybe_skip(self, x):
        if getattr(self, "feature_group_count", 1) > 1:
            return x
        return orig(self, x)

    nn.Conv.__call__ = maybe_skip
    return lambda: setattr(nn.Conv, "__call__", orig)


def patch_plainattn():
    """Relpos kernel -> plain flash (drop the position term only; all
    projections, pos_bias adds, and the P table matmul params stay)."""
    from transformer_tts_tpu.ops import flash_relpos as FR
    from transformer_tts_tpu.ops.flash_attention import flash_attention
    orig = FR.flash_relpos_attention

    def plain(q_u, q_v, k, v, p, k_len, *, dropout_rate=0.0,
              dropout_seed=None, **kw):
        return flash_attention(q_u, k, v, k_len, dropout_rate=dropout_rate,
                               dropout_seed=dropout_seed)

    FR.flash_relpos_attention = plain
    return lambda: setattr(FR, "flash_relpos_attention", orig)


VARIANTS = {
    "full": ("conformer enc+dec (baseline)", None, None),
    "noff": ("  - macaron FFNs (x2/layer)", patch_ff, None),
    "noconv": ("  - conv module", patch_conv, None),
    "nodw": ("  - depthwise conv only", patch_dw, None),
    "plainattn": ("  - relpos term (plain flash)", patch_plainattn, None),
    "enc_transformer": ("conformer dec only", None,
                        dict(encoder_type="transformer",
                             decoder_type="conformer")),
    "transformer": ("transformer enc+dec (ref pt)", None, {}),
}


def main():
    from transformer_tts_tpu.bench_utils import enable_compilation_cache
    enable_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    for key in names:
        label, patch, kw = VARIANTS[key]
        time_variant(label, patch, kw)


if __name__ == "__main__":
    main()
