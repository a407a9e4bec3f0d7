"""AR Transformer-TTS: train step smoke + KV-cache decode parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.models.transformer_tts import TransformerTTS
from transformer_tts_tpu.infer.synthesize import synthesize_transformer_tts
from transformer_tts_tpu.ops.masks import create_masks
from transformer_tts_tpu.train.trainer import (
    init_transformer_state, make_transformer_train_step)


def ar_hp(**kw):
    return HParams(
        model="Transformer", d_model_encoder=32, d_model_decoder=32,
        n_layer_encoder=2, n_layer_decoder=2, n_head_encoder=2,
        n_head_decoder=2, vocab_size=30, mel_dim=8, reduction_rate=2,
        ff_conv_kernel_size_decoder=1, amp=False, optimizer="Noam",
        warmup_step=10, batch_size=2, **kw)


def make_ar_batch(seed, b=2, l=10, t=32, mel_dim=8, vocab=30):
    rs = np.random.RandomState(seed)
    mel = rs.randn(b, t, mel_dim).astype(np.float32)
    mel[:, 0] = 0.0  # go frame (datasets_transformer.py:93-96)
    stop = np.zeros((b, t), np.float32)
    stop[:, -4:] = 1.0
    return {
        "text": jnp.asarray(rs.randint(1, vocab, (b, l)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, l + 1)[None], (b, 1)),
        "mel": jnp.asarray(mel),
        "pos_mel": jnp.tile(jnp.arange(1, t + 1)[None], (b, 1)),
        "stop_token": jnp.asarray(stop),
    }


@pytest.mark.slow
def test_transformer_train_step_runs_and_learns():
    hp = ar_hp(warmup_factor=2.0)
    model, state = init_transformer_state(hp, jax.random.PRNGKey(0))
    step_fn = make_transformer_train_step(model, hp, donate=False)
    batch = make_ar_batch(0)
    rng = jax.random.PRNGKey(7)
    state, logs0 = step_fn(state, batch, rng)
    for _ in range(60):
        state, logs = step_fn(state, batch, rng)
    assert np.isfinite(float(logs["loss_total"]))
    assert float(logs["loss_frame_before"]) < 0.8 * float(
        logs0["loss_frame_before"])


def test_kv_cache_decode_matches_full_forward():
    """Incremental decode with caches == full teacher-forced forward.

    Feed the decoder the SAME input sequence both ways (train=False,
    dropout off); per-step cached outputs must equal the full forward's
    rows. This is the parity the reference cannot test (it has no cache).
    """
    hp = ar_hp()
    model, state = init_transformer_state(hp, jax.random.PRNGKey(3))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    b, l, steps = 2, 10, 6
    r, mel_dim = hp.reduction_rate, hp.mel_dim
    rs = np.random.RandomState(5)
    text = jnp.asarray(rs.randint(1, 30, (b, l)).astype(np.int32))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    trg = jnp.asarray(rs.randn(b, steps, mel_dim).astype(np.float32))
    src_mask, trg_mask = create_masks(
        pos_text, jnp.tile(jnp.arange(1, steps + 1)[None], (b, 1)),
        model="transformer")

    # full forward
    out = model.apply(variables, text, trg, src_mask, trg_mask, train=False)

    # incremental
    e_outputs, _ = model.apply(variables, text, src_mask, train=False,
                               method=TransformerTTS.encode)
    heads = hp.n_head_decoder
    d_k = hp.d_model_decoder // heads
    caches = tuple(
        (jnp.zeros((b, heads, steps, d_k)), jnp.zeros((b, heads, steps, d_k)))
        for _ in range(hp.n_layer_decoder))
    for i in range(steps):
        group, stop, caches = model.apply(
            variables, trg[:, i:i + 1], e_outputs, src_mask, caches,
            jnp.asarray(i), method=TransformerTTS.decode_step)
        np.testing.assert_allclose(
            np.asarray(group[:, 0]), np.asarray(out.mel_pre[:, i]),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(stop[:, 0]), np.asarray(out.stop_token[:, i]),
            rtol=2e-4, atol=2e-5)


def test_synthesize_transformer_tts_shapes_and_stop():
    hp = ar_hp()
    model, state = init_transformer_state(hp, jax.random.PRNGKey(1))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    b, l = 1, 10
    text = jnp.asarray(
        np.random.RandomState(0).randint(1, 30, (b, l)).astype(np.int32))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    mel, lengths = synthesize_transformer_tts(
        model, variables, text, pos_text, max_steps=12)
    assert mel.shape == (b, 12 * hp.reduction_rate, hp.mel_dim)
    assert 0 < int(lengths[0]) <= 12 * hp.reduction_rate
    # frames beyond length are zero
    n = int(lengths[0])
    if n < mel.shape[1]:
        np.testing.assert_array_equal(np.asarray(mel[0, n:]), 0.0)


# weekly tier: GST covered by test_models.py::test_gst_training_path_uses_target_mel + test_cli.py::test_gst_ref_mel_cli_path
@pytest.mark.weekly
def test_gst_style_changes_encoding():
    hp = ar_hp(gst=True)
    model, state = init_transformer_state_gst(hp)
    variables = {"params": state[0], "batch_stats": state[1]}
    b, l, t = 1, 10, 16
    rs = np.random.RandomState(0)
    text = jnp.asarray(rs.randint(1, 30, (b, l)).astype(np.int32))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    from transformer_tts_tpu.ops.masks import pad_mask
    src_mask = pad_mask(pos_text)
    ref1 = jnp.asarray(rs.randn(b, t, hp.mel_dim).astype(np.float32))
    ref2 = jnp.asarray(rs.randn(b, t, hp.mel_dim).astype(np.float32) * 3)
    e1, _ = model.apply(variables, text, src_mask, None, ref1, train=False,
                        method=TransformerTTS.encode)
    e2, _ = model.apply(variables, text, src_mask, None, ref2, train=False,
                        method=TransformerTTS.encode)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def init_transformer_state_gst(hp):
    """Init a GST model (needs a style mel at init)."""
    from transformer_tts_tpu.models.transformer_tts import (
        build_transformer_tts)
    model = build_transformer_tts(hp)
    b, l, t = 2, 10, 16
    src = jnp.ones((b, l), jnp.int32)
    trg = jnp.zeros((b, t // hp.reduction_rate, hp.mel_dim))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    pos_mel = jnp.tile(
        jnp.arange(1, t // hp.reduction_rate + 1)[None], (b, 1))
    src_mask, trg_mask = create_masks(pos_text, pos_mel, model="transformer")
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, src, trg,
                           src_mask, trg_mask, train=True)
    return model, (variables["params"], variables.get("batch_stats", {}))
