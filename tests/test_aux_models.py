"""Tacotron2 decoder, LSTM LM, and aux-utility tests."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_tts_tpu.models.tacotron2_decoder import Tacotron2Decoder
from transformer_tts_tpu.models.lm import LSTMLanguageModel
from transformer_tts_tpu import utils as U


def test_tacotron2_decoder_teacher_forced():
    mel_dim, d, d_e, r = 8, 16, 32, 2
    b, t, l = 2, 12, 6
    model = Tacotron2Decoder(mel_dim=mel_dim, d_model=d, d_model_encoder=d_e,
                             reduction_rate=r)
    rs = np.random.RandomState(0)
    meltarget = jnp.asarray(rs.randn(b, t, mel_dim).astype(np.float32))
    e_outputs = jnp.asarray(rs.randn(b, l, d_e).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, meltarget,
                           e_outputs, train=True)
    frames, stops, attention = model.apply(
        variables, meltarget, e_outputs, train=True,
        rngs={"dropout": rng})
    assert frames.shape == (b, t, mel_dim)
    assert stops.shape == (b, t)
    assert attention.shape == (b, t // r, l)
    # attention rows are distributions
    np.testing.assert_allclose(np.asarray(attention.sum(-1)), 1.0,
                               rtol=1e-4)


def test_tacotron2_decoder_synthesize():
    mel_dim, d, d_e, r = 8, 16, 32, 2
    b, l = 1, 6
    model = Tacotron2Decoder(mel_dim=mel_dim, d_model=d, d_model_encoder=d_e,
                             reduction_rate=r)
    rs = np.random.RandomState(1)
    e_outputs = jnp.asarray(rs.randn(b, l, d_e).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    meltarget = jnp.zeros((b, 4, mel_dim))
    variables = model.init({"params": rng, "dropout": rng}, meltarget,
                           e_outputs, train=False)
    frames, lengths = model.apply(
        variables, e_outputs, jnp.array([l]), max_steps=20,
        method=Tacotron2Decoder.synthesize)
    assert frames.shape == (b, 40, mel_dim)
    assert 0 < int(lengths[0]) <= 40


def test_lstm_lm():
    model = LSTMLanguageModel(vocab_size=30, hidden_size=16, num_layers=2)
    t1 = jnp.asarray(np.random.RandomState(0).randint(0, 30, (2, 7)))
    t2 = jnp.asarray(np.random.RandomState(1).randint(0, 30, (2, 7)))
    variables = model.init(jax.random.PRNGKey(0), t1, t2)
    l1, l2 = model.apply(variables, t1, t2)
    assert l1.shape == (2, 7, 30)
    assert l2.shape == (2, 7, 30)


def test_spec_augment_masks_something():
    rs = np.random.RandomState(0)
    spec = rs.rand(2, 60, 20).astype(np.float32) + 1.0
    out = U.spec_augment(spec, T=20, F=8, rng=np.random.RandomState(3))
    assert out.shape == spec.shape
    assert (out == 0.0).sum() > 0          # some cells zeroed
    assert not np.allclose(out, spec)


def test_plot_alignment(tmp_path):
    mel = np.random.RandomState(0).rand(30, 20)
    durations = np.array([5, 10, 15])
    path = U.plot_mel_and_alignment(mel, durations,
                                    str(tmp_path / "align.png"))
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_metrics_logger(tmp_path):
    logger = U.MetricsLogger(str(tmp_path), "t")
    logger.log(1, loss=0.5, lr=1e-3)
    logger.log(2, loss=0.4)
    logger.close()
    import json
    lines = [json.loads(x) for x in open(logger.path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


def test_encoder_postprocessing_ctc_tap():
    from transformer_tts_tpu.models.encoder import EncoderPostprocessing
    model = EncoderPostprocessing(
        vocab_size=16, d_model=16, n_layers=3, heads=2, ff_kernel_size=3,
        embedding=False, gender_emb=True, speaker_emb=True, ctc_out=True,
        ctc_classes=20)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 10, 16).astype(np.float32))
    mask = jnp.ones((2, 1, 10), bool)
    spk = jnp.array([0, 3])
    gender = jnp.array([0, 1])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, mask, spk,
                           None, gender, train=False)
    out, ctc, _ = model.apply(variables, x, mask, spk, None, gender,
                              train=False)
    assert out.shape == (2, 10, 16)
    assert ctc.shape == (2, 10, 20)


def test_aligner_runs():
    from transformer_tts_tpu.models.variance_adaptor import Aligner
    model = Aligner(d_model=16, max_duration=10)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 16),
                    jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    out = model.apply(variables, x, train=True, rngs={"dropout": rng})
    assert out.shape == (2, 6, 10)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
