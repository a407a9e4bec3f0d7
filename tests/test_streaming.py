"""Streaming synthesis: exactness of chunked vocoding and segmented AR
decode vs the one-shot paths, plus the engine/server streaming surface.

The contract under test (infer/streaming.py): streamed chunks, when
concatenated, EQUAL the one-shot pipeline's output — streaming buys
latency, never changes the audio.
"""

import json
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_tts_tpu.config import HParams

MEL_DIM = 8


def tiny_gen(mode="subpixel", seed=0):
    from transformer_tts_tpu.vocoder.generator import HiFiGANGenerator
    gen = HiFiGANGenerator(
        mel_dim=MEL_DIM, upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        upsample_mode=mode)
    mel = jnp.zeros((1, 8, MEL_DIM))
    params = gen.init(jax.random.PRNGKey(seed), mel)
    return gen, params


# ------------------------------------------------------------- vocoder

def test_receptive_field_is_architectural():
    from transformer_tts_tpu.infer.streaming import receptive_field_frames
    gen, _ = tiny_gen()
    rf = receptive_field_frames(gen)
    assert 4 <= rf <= 12                     # tiny config: ~7 frames
    from transformer_tts_tpu.vocoder.generator import HiFiGANGenerator
    v1 = HiFiGANGenerator()                  # production 22.05 kHz config
    assert 10 <= receptive_field_frames(v1) <= 24


@pytest.mark.parametrize("mode", ["subpixel", "transposed"])
@pytest.mark.parametrize("length", [96, 57])
def test_streaming_vocoder_equals_oneshot(mode, length):
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen(mode)
    rs = np.random.RandomState(1)
    mel = rs.randn(2, 96, MEL_DIM).astype(np.float32)
    full = np.asarray(gen.apply(params, jnp.asarray(mel)))
    sv = StreamingVocoder(gen, params, chunk_frames=16)
    assert sv.window < mel.shape[1]          # real windowing exercised
    chunks = list(sv.stream(mel, length=length))
    assert len(chunks) > 1
    got = np.concatenate([w for _, w in chunks], axis=1)
    # chunk start offsets are contiguous
    starts = [s for s, _ in chunks]
    sizes = [w.shape[1] for _, w in chunks]
    assert starts == [0] + list(np.cumsum(sizes)[:-1])
    np.testing.assert_allclose(got, full[:, :length * gen.hop_length],
                               atol=1e-5, rtol=1e-5)


def test_streaming_vocoder_small_buffer_one_shot():
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen()
    rs = np.random.RandomState(2)
    mel = rs.randn(12, MEL_DIM).astype(np.float32)   # (T, mel) squeeze path
    sv = StreamingVocoder(gen, params, chunk_frames=16)
    assert mel.shape[0] <= sv.window
    chunks = list(sv.stream(mel, length=10))
    assert len(chunks) == 1
    full = np.asarray(gen.apply(params, jnp.asarray(mel[None])))[0]
    np.testing.assert_allclose(chunks[0][1], full[:10 * gen.hop_length],
                               atol=1e-6)


def test_streaming_vocoder_rejects_small_overlap():
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen()
    with pytest.raises(ValueError, match="receptive field"):
        StreamingVocoder(gen, params, overlap_frames=2)


def test_vocoder_session_incremental_equals_oneshot():
    """Feed masked decode chunks (the ARStream contract: frames beyond a
    row's length are already zero), finish with the per-row lengths; the
    concatenated audio equals the one-shot vocode of the masked buffer."""
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen()
    rs = np.random.RandomState(3)
    total, lengths = 96, [61, 71]
    mel = rs.randn(2, total, MEL_DIM).astype(np.float32)
    masked = mel.copy()
    for b, ln in enumerate(lengths):
        masked[b, ln:] = 0.0
    full = np.asarray(gen.apply(params, jnp.asarray(masked)))

    sv = StreamingVocoder(gen, params, chunk_frames=16)
    sess = sv.session(total, batch=2, mel_dim=MEL_DIM)
    got, early = [], 0
    fed = 0
    for step in [7, 11, 13, 25, 19]:          # odd-sized decode chunks
        out = sess.feed(masked[:, fed:fed + step])
        fed += step
        early += len(out)
        got.extend(out)
    assert fed == 75                           # decode stopped before 96
    assert early > 0                           # audio flowed before finish
    got.extend(sess.finish(lengths))
    wav = np.concatenate([w for _, w in got], axis=1)
    n = max(lengths) * gen.hop_length
    assert wav.shape[1] == n
    np.testing.assert_allclose(wav, full[:, :n], atol=1e-5, rtol=1e-5)


def test_vocoder_session_full_feed_emits_everything():
    """If decode runs to the buffer end, feed() alone drains the session
    (exactly the one-shot vocode); finish() then has nothing left."""
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen()
    rs = np.random.RandomState(5)
    mel = rs.randn(1, 64, MEL_DIM).astype(np.float32)
    full = np.asarray(gen.apply(params, jnp.asarray(mel)))
    sv = StreamingVocoder(gen, params, chunk_frames=16)
    sess = sv.session(64, batch=1, mel_dim=MEL_DIM)
    got = sess.feed(mel)
    assert sess.finish([64]) == []
    wav = np.concatenate([w for _, w in got], axis=1)
    np.testing.assert_allclose(wav, full, atol=1e-5, rtol=1e-5)


def test_vocoder_session_guards():
    from transformer_tts_tpu.infer.streaming import StreamingVocoder
    gen, params = tiny_gen()
    sv = StreamingVocoder(gen, params, chunk_frames=16)
    with pytest.raises(ValueError, match="total_frames"):
        sv.session(sv.window - 1)
    sess = sv.session(sv.window, batch=1, mel_dim=MEL_DIM)
    with pytest.raises(ValueError, match="past the session buffer"):
        sess.feed(np.zeros((1, sv.window + 1, MEL_DIM), np.float32))


# ------------------------------------------------------------- AR decode

def _ar_model(seed=0):
    from tests.test_transformer_tts import ar_hp
    from transformer_tts_tpu.train.trainer import init_transformer_state
    hp = ar_hp()
    model, state = init_transformer_state(hp, jax.random.PRNGKey(seed))
    return model, {"params": state.params, "batch_stats": state.batch_stats}


@pytest.mark.parametrize("stop_threshold", [2.0, 0.5])
def test_ar_stream_equals_oneshot(stop_threshold):
    """Segmented streaming decode == the single while_loop decode,
    both for forced full-length decode (threshold 2.0 never fires on an
    untrained net) and for whatever the stop heads do at 0.5."""
    from transformer_tts_tpu.infer.streaming import ARStream
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_transformer_tts)
    model, variables = _ar_model()
    rs = np.random.RandomState(4)
    b, l, max_steps = 2, 10, 24
    text = jnp.asarray(rs.randint(1, 30, (b, l)).astype(np.int32))
    pos = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    mean = jnp.asarray(rs.randn(MEL_DIM).astype(np.float32))
    var = jnp.asarray(rs.rand(MEL_DIM).astype(np.float32) + 0.5)

    ref_mel, ref_len = synthesize_transformer_tts(
        model, variables, text, pos, mean=mean, var=var,
        max_steps=max_steps, stop_threshold=stop_threshold)
    ref_mel, ref_len = np.asarray(ref_mel), np.asarray(ref_len)

    stream = ARStream(model, variables, text, pos, mean=mean, var=var,
                      max_steps=max_steps, segment_steps=7,
                      stop_threshold=stop_threshold)
    chunks = list(stream)
    assert stream.lengths is not None
    np.testing.assert_array_equal(stream.lengths, ref_len)
    got = np.concatenate([c for _, c in chunks], axis=1)
    starts = [s for s, _ in chunks]
    sizes = [c.shape[1] for _, c in chunks]
    assert starts == [0] + list(np.cumsum(sizes)[:-1])
    if stop_threshold > 1.0:
        assert len(chunks) == -(-max_steps // 7)   # every segment yielded
        assert got.shape[1] == ref_mel.shape[1]
    # streamed frames equal the one-shot mel over the streamed range
    np.testing.assert_allclose(got, ref_mel[:, :got.shape[1]],
                               atol=1e-5, rtol=1e-5)
    # beyond the streamed range the one-shot mel is only masked zeros
    assert np.all(ref_mel[:, got.shape[1]:] == 0.0)


# ------------------------------------------------------- engine + server

def _fs2_corpus(tmp_path, rs):
    lines = []
    for i in range(4):
        t_text = rs.randint(4, 8)
        t_mel = t_text * 3
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), 3, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(lines[:2]) + "\n")


@pytest.mark.slow
def test_engine_streaming_nar_and_server(tmp_path):
    """NAR engine streaming: concatenated pcm equals the batched
    synthesize() audio; the HTTP /synthesize_stream endpoint delivers
    the same samples as JSONL pcm16 chunks.

    The checkpoint is built directly (no training) with the duration
    predictor's output bias set to log(5), so the untrained model
    deterministically predicts ~4 frames per phone — streaming has real
    audio to deliver."""
    from tests.test_vocoder import TINY, tiny_state
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state
    voc_fields = {k: v for k, v in TINY.items()
                  if k.startswith("vocoder_")}
    cfg = dict(
        architecture="text-mel", model="Fastspeech2", vocab_size=20,
        mel_dim=MEL_DIM, d_model_encoder=16, d_model_decoder=16,
        n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
        n_head_decoder=2, batch_size=2, amp=False,
        text_buckets=(8, 16), length_buckets=(32, 64), **voc_fields)
    hp = HParams(**cfg)
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    bias = state.params["variance_adaptor"]["duration_predictor"][
        "linear_layer"]["bias"]
    state.params["variance_adaptor"]["duration_predictor"][
        "linear_layer"]["bias"] = bias + np.log(5.0)
    save_dir = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(save_dir, state, 1, with_optimizer=False)
    with open(f"{save_dir}/hparams.py", "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    from transformer_tts_tpu.vocoder.trainer import export_generator
    _, voc_state, gen, _ = tiny_state()
    voc_dir = export_generator(str(tmp_path / "voc"), voc_state)

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,), vocoder=voc_dir)
    text = [1, 2, 3, 4, 5]
    ref = engine.synthesize([text])[0]

    events = list(engine.synthesize_streaming(text, chunk_frames=8))
    assert events[-1]["type"] == "end"
    assert events[-1]["mel_frames"] == ref["mel"].shape[0]
    np.testing.assert_array_equal(events[-1]["durations"],
                                  ref["durations"])
    pcm = np.concatenate([e["pcm"] for e in events
                          if e["type"] == "audio"])
    np.testing.assert_allclose(pcm, ref["audio"], atol=1e-5, rtol=1e-5)

    # HTTP: JSONL chunks over a close-delimited response
    from http.client import HTTPConnection
    from transformer_tts_tpu.infer.server import TTSServer
    server = TTSServer(engine, port=0, batch_window_ms=1.0)
    server.start()
    try:
        conn = HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("POST", "/synthesize_stream",
                     json.dumps({"text_ids": text, "chunk_frames": 8}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(ln) for ln in resp.read().splitlines()]
        conn.close()
    finally:
        server.stop()
    assert lines[-1]["done"] and lines[-1]["mel_frames"] == \
        ref["mel"].shape[0]
    import base64
    pcm16 = np.concatenate([
        np.frombuffer(base64.b64decode(ln["pcm16_base64"]), "<i2")
        for ln in lines[:-1]])
    assert pcm16.shape[0] == ref["audio"].shape[0]
    np.testing.assert_allclose(pcm16 / 32767.0,
                               np.clip(ref["audio"], -1, 1), atol=2e-4)

    # bad request fails before the stream starts (single JSON error)
    server = TTSServer(engine, port=0)
    server.start()
    try:
        conn = HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("POST", "/synthesize_stream", json.dumps({}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
    finally:
        server.stop()


@pytest.mark.slow
def test_engine_streaming_ar_mel_events(tmp_path):
    """AR engine without a vocoder streams mel chunks whose
    concatenation equals the batched synthesize() mel."""
    from tests.test_cli import write_hp
    rs = np.random.RandomState(0)
    _fs2_corpus(tmp_path, rs)
    hp_path, save_dir = write_hp(
        tmp_path, tmp_path, max_epoch=1, model="Transformer",
        reduction_rate=2, ff_conv_kernel_size_decoder=1,
        positive_weight=5.0)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,))
    text = [1, 2, 3, 4]
    ref = engine.synthesize([text])[0]
    events = list(engine.synthesize_streaming(text, segment_steps=4))
    assert events[-1]["type"] == "end"
    n = events[-1]["mel_frames"]
    assert n == ref["mel"].shape[0]
    mel = np.concatenate([e["mel"] for e in events
                          if e["type"] == "mel"])
    assert mel.shape[0] >= n
    np.testing.assert_allclose(mel[:n], ref["mel"], atol=1e-5, rtol=1e-5)


def test_streaming_vocoder_istft_equals_oneshot():
    """The iSTFT family streams exactly: its declared receptive-field
    radius covers the backbone convs AND the overlap-add span, so
    windowed emissions match the one-shot vocode sample-for-sample."""
    from transformer_tts_tpu.infer.streaming import (
        StreamingVocoder, receptive_field_frames)
    from transformer_tts_tpu.vocoder.generator import ISTFTVocoder
    gen = ISTFTVocoder(mel_dim=MEL_DIM, channels=16, mlp_dim=32,
                       num_layers=2, n_fft=16, hop_length=8)
    params = gen.init(jax.random.PRNGKey(3),
                      jnp.zeros((1, 8, MEL_DIM)))
    assert receptive_field_frames(gen) == gen.receptive_field_radius_frames
    rs = np.random.RandomState(4)
    mel = rs.randn(2, 96, MEL_DIM).astype(np.float32)
    full = np.asarray(gen.apply(params, jnp.asarray(mel)))
    sv = StreamingVocoder(gen, params, chunk_frames=16)
    assert sv.window < mel.shape[1]          # real windowing exercised
    chunks = list(sv.stream(mel, length=90))
    assert len(chunks) > 1
    got = np.concatenate([w for _, w in chunks], axis=1)
    np.testing.assert_allclose(got, full[:, :90 * gen.hop_length],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_engine_with_istft_vocoder_oneshot_and_streaming(tmp_path):
    """The engine serves the iSTFT family end-to-end: hp.vocoder_type
    rides in the acoustic hparams snapshot, the orbax generator export
    restores into the ConvNeXt param tree, one-shot results carry
    T*hop audio, and streamed pcm equals the one-shot audio."""
    from tests.test_vocoder import TINY, tiny_state
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state
    voc_fields = {k: v for k, v in TINY.items()
                  if k.startswith("vocoder_")}
    voc_fields.update(vocoder_type="istft", vocoder_istft_n_fft=16,
                      vocoder_convnext_channels=16,
                      vocoder_convnext_layers=2,
                      vocoder_convnext_mlp=32)
    cfg = dict(
        architecture="text-mel", model="Fastspeech2", vocab_size=20,
        mel_dim=MEL_DIM, d_model_encoder=16, d_model_decoder=16,
        n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
        n_head_decoder=2, batch_size=2, amp=False,
        text_buckets=(8, 16), length_buckets=(32, 64), **voc_fields)
    hp = HParams(**cfg)
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    bias = state.params["variance_adaptor"]["duration_predictor"][
        "linear_layer"]["bias"]
    state.params["variance_adaptor"]["duration_predictor"][
        "linear_layer"]["bias"] = bias + np.log(5.0)
    save_dir = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(save_dir, state, 1, with_optimizer=False)
    with open(f"{save_dir}/hparams.py", "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    from transformer_tts_tpu.vocoder.generator import ISTFTVocoder
    from transformer_tts_tpu.vocoder.trainer import export_generator
    _, voc_state, gen, _ = tiny_state(**{
        k: v for k, v in voc_fields.items()})
    assert isinstance(gen, ISTFTVocoder)
    voc_dir = export_generator(str(tmp_path / "voc"), voc_state)

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,), vocoder=voc_dir)
    text = [1, 2, 3, 4, 5]
    ref = engine.synthesize([text])[0]
    assert ref["audio"].shape == (ref["mel"].shape[0] * gen.hop_length,)
    assert ref["audio"].dtype == np.float32

    events = list(engine.synthesize_streaming(text, chunk_frames=8))
    assert events[-1]["type"] == "end"
    pcm = np.concatenate([e["pcm"] for e in events
                          if e["type"] == "audio"])
    np.testing.assert_allclose(pcm, ref["audio"], atol=1e-5, rtol=1e-5)
