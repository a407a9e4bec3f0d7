"""Serving engine + micro-batching server tests."""

import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest


# ---------------- micro-batcher (fast, no model) ----------------

def test_microbatcher_coalesces_and_preserves_order():
    from transformer_tts_tpu.infer.server import MicroBatcher

    calls = []

    def fake_synth(texts, speakers=None):
        calls.append([len(t) for t in texts])
        return [{"mel": np.zeros((len(t), 4), np.float32),
                 "durations": np.ones((len(t),), np.int32)} for t in texts]

    mb = MicroBatcher(fake_synth, batch_size=4, batch_window_ms=50.0)
    results = [None] * 6

    def worker(i):
        results[i] = mb.submit(list(range(1, i + 2)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()

    for i, r in enumerate(results):
        assert r["mel"].shape == (i + 1, 4)   # each caller got its own
    # coalescing happened: fewer synth calls than requests
    assert 2 <= len(calls) <= 5
    assert sum(len(c) for c in calls) == 6


def test_microbatcher_propagates_errors():
    from transformer_tts_tpu.infer.server import MicroBatcher

    def bad_synth(texts, speakers=None):
        raise ValueError("boom")

    mb = MicroBatcher(bad_synth, batch_size=2, batch_window_ms=1.0)
    with pytest.raises(RuntimeError, match="boom"):
        mb.submit([1, 2, 3])
    mb.close()


# ---------------- end-to-end engine + HTTP (slow) ----------------

@pytest.mark.slow
def test_engine_server_export_roundtrip(tmp_path):
    # build the same tiny corpus/checkpoint as the CLI tests
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
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

    hp_path, save_dir = write_hp(tmp_path, tmp_path, max_epoch=1)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,))
    times = engine.warmup()
    assert set(times) == {8}

    # direct batched synthesis: ragged batch, trimmed outputs
    texts = [[1, 2, 3], [4, 5, 6, 7, 2]]
    results = engine.synthesize(texts)
    assert len(results) == 2
    for t, r in zip(texts, results):
        assert r["mel"].ndim == 2 and r["mel"].shape[1] == MEL_DIM
        assert r["durations"].shape == (len(t),)
        assert r["mel"].shape[0] == int(r["durations"].sum())

    # HTTP round trip through the micro-batcher
    from transformer_tts_tpu.infer.server import TTSServer
    server = TTSServer(engine, port=0, batch_window_ms=1.0)
    server.start()
    try:
        conn = HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["text_buckets"] == [8]

        body = json.dumps({"text_ids": [1, 2, 3]})
        conn.request("POST", "/synthesize", body,
                     {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert resp["mel_frames"] == len(resp["mel"])
        # barely-trained model may predict 0 frames; reshape keeps the
        # comparison well-defined either way
        got = np.asarray(resp["mel"], np.float32).reshape(-1, MEL_DIM)
        np.testing.assert_allclose(got, results[0]["mel"], atol=1e-4)
        assert resp["durations"] == [int(d)
                                     for d in results[0]["durations"]]

        # batch endpoint bypasses the batcher
        body = json.dumps({"batch": texts})
        conn.request("POST", "/synthesize", body,
                     {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert len(resp["results"]) == 2
        conn.close()
    finally:
        server.stop()

    # export -> deserialize -> identical outputs, no model code
    import jax
    from jax import export as jexport
    out_dir = str(tmp_path / "exported")
    manifest = engine.export(out_dir)
    assert "8" in manifest["buckets"]
    with open(f"{out_dir}/{manifest['buckets']['8']['file']}", "rb") as fh:
        exp = jexport.deserialize(fh.read())
    text = np.zeros((2, 8), np.int32)
    pos = np.zeros((2, 8), np.int32)
    text[0, :3] = [1, 2, 3]
    pos[0, :3] = [1, 2, 3]
    mel_x, len_x, dur_x = jax.jit(exp.call)(text, pos)
    mel_e, len_e, dur_e = engine._run_padded(text, pos)
    np.testing.assert_allclose(np.asarray(mel_x), np.asarray(mel_e),
                               atol=1e-5)
    assert int(len_x[0]) == int(len_e[0])


def test_result_to_json_wav():
    from transformer_tts_tpu.infer.server import _result_to_json
    import base64, io, wave
    rs = np.random.RandomState(0)
    r = {"mel": rs.randn(40, 8).astype(np.float32),
         "durations": np.ones(5, np.int32)}
    out = _result_to_json(r, wav=True, mel_dim=8)
    assert out["sample_rate"] == 22050
    raw = base64.b64decode(out["wav_base64"])
    with wave.open(io.BytesIO(raw)) as fh:
        assert fh.getframerate() == 22050
        assert fh.getnchannels() == 1
        # 40 frames * 256 hop samples (+/- istft edge)
        assert abs(fh.getnframes() - 40 * 256) < 1024


@pytest.mark.slow
def test_engine_multispeaker(tmp_path):
    """Engine serves a speaker-id-conditioned model per request."""
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
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
        lines.append(f"{base}|{ids}|{i % 2}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(lines[:2]) + "\n")
    hp_path, save_dir = write_hp(
        tmp_path, tmp_path, max_epoch=1, is_multi_speaker=True,
        spk_emb_type="speaker_id", spk_emb_dim=4, num_speakers=4,
        spk_emb_architecture=("encoder",))
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,))
    r = engine.synthesize([[1, 2, 3], [1, 2, 3]], speakers=[0, 1])
    assert len(r) == 2
    # different speakers must change the output (same text)
    if r[0]["mel"].shape == r[1]["mel"].shape and r[0]["mel"].size:
        assert not np.allclose(r[0]["mel"], r[1]["mel"])


def test_microbatcher_overload_rejects():
    from transformer_tts_tpu.infer.server import MicroBatcher, ServerFull
    import time as _t
    gate = threading.Event()

    def slow_synth(texts, speakers=None):
        gate.wait(timeout=5)
        return [{"mel": np.zeros((1, 4), np.float32),
                 "durations": np.ones((1,), np.int32)} for _ in texts]

    mb = MicroBatcher(slow_synth, batch_size=1, batch_window_ms=1.0,
                      max_queue=2)
    results, errors = [], []

    def worker():
        try:
            results.append(mb.submit([1]))
        except ServerFull as e:
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
        _t.sleep(0.02)          # deterministic queue fill order
    gate.set()
    for t in threads:
        t.join()
    mb.close()
    assert len(errors) >= 1            # overload rejected fast
    assert len(results) + len(errors) == 6
    assert mb.n_rejected == len(errors)
    assert mb.n_batches == len(results)


@pytest.mark.slow
def test_serve_cli_export(tmp_path, capsys):
    """cli.serve --export writes artifacts + manifest and exits."""
    from tests.test_cli import write_hp
    rs = np.random.RandomState(0)
    lines = []
    for i in range(3):
        t_text = 5
        t_mel = 15
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, 8).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), 3, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text(lines[0] + "\n")
    hp_path, save_dir = write_hp(tmp_path, tmp_path, max_epoch=1)
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import serve as cli_serve
    cli_train.main(["--hp_file", hp_path])
    out_dir = str(tmp_path / "exported")
    cli_serve.main(["--load_name", save_dir, "--export", out_dir,
                    "--buckets", "8", "--batch_size", "2"])
    import os as _os
    assert _os.path.exists(_os.path.join(out_dir, "manifest.json"))
    manifest = json.loads(
        open(_os.path.join(out_dir, "manifest.json")).read())
    art = _os.path.join(out_dir, manifest["buckets"]["8"]["file"])
    assert _os.path.getsize(art) > 1000


@pytest.mark.slow
def test_engine_serves_ar_transformer(tmp_path):
    """AR Transformer-TTS through the same engine: batched KV-cached
    decode behind the bucketed API."""
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
    lines = []
    for i in range(4):
        t_text = rs.randint(4, 8)
        t_mel = t_text * 3
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text(lines[0] + "\n")
    hp_path, save_dir = write_hp(
        tmp_path, tmp_path, model="Transformer", max_epoch=1,
        reduction_rate=2, ff_conv_kernel_size_decoder=1)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,))
    engine.warmup()
    results = engine.synthesize([[1, 2, 3], [4, 5, 6, 7]])
    assert len(results) == 2
    for r in results:
        assert r["mel"].ndim == 2 and r["mel"].shape[1] == MEL_DIM
        assert r["mel"].dtype == np.float32
        assert r["durations"].shape == (0,)   # AR: no phone durations
        # stop decision caps at max_steps*r frames
        assert r["mel"].shape[0] <= engine.max_frames_for(8)


@pytest.mark.slow
def test_engine_serves_xvector_model(tmp_path):
    """x-vector models serve with per-request float speaker embeddings
    (VERDICT r2: the engine previously built int32 speaker ids only and
    would mis-trace float-conditioned models)."""
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
    dim = 16
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
        np.save(tmp_path / f"utt{i}_xvector.npy",
                rs.randn(dim).astype(np.float32))
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(lines[:2]) + "\n")
    hp_path, save_dir = write_hp(
        tmp_path, tmp_path, max_epoch=1, is_multi_speaker=True,
        spk_emb_type="x_vector", spk_emb_dim=dim,
        spk_emb_architecture=("middle",))
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,))
    assert engine.is_xvector and engine.spk_emb_dim == dim
    times = engine.warmup()            # compiles the x-vector signature
    assert list(times) == [8]
    v0 = rs.randn(dim).astype(np.float32)
    v1 = rs.randn(dim).astype(np.float32)
    r = engine.synthesize([[1, 2, 3], [1, 2, 3], [2, 3]],
                          speakers=[v0, v1, None])
    assert len(r) == 3
    # different x-vectors must change the output (same text)
    if r[0]["mel"].shape == r[1]["mel"].shape and r[0]["mel"].size:
        assert not np.allclose(r[0]["mel"], r[1]["mel"])
    # wrong-dim embedding fails fast with a clear error
    with pytest.raises(ValueError, match="x-vector"):
        engine.synthesize([[1, 2]], speakers=[np.zeros(3, np.float32)])
    # int ids are rejected on x-vector models (shape mismatch)
    with pytest.raises(ValueError):
        engine.synthesize([[1, 2]], speakers=[1])
    # micro-batcher path carries vectors through (server contract)
    from transformer_tts_tpu.infer.server import MicroBatcher
    mb = MicroBatcher(engine.synthesize, batch_size=2,
                      batch_window_ms=1.0)
    got = mb.submit([1, 2, 3], speaker=list(map(float, v0)))
    assert got["mel"].ndim == 2
    mb.close()


@pytest.mark.slow
def test_engine_with_neural_vocoder(tmp_path):
    """Engine carries a neural vocoder: results gain an "audio" field
    (T * hop samples) and wav responses use it instead of Griffin-Lim."""
    from tests.test_cli import write_hp, MEL_DIM
    from tests.test_vocoder import TINY, tiny_state
    rs = np.random.RandomState(0)
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
    voc_fields = {k: v for k, v in TINY.items()
                  if k.startswith("vocoder_")}
    hp_path, save_dir = write_hp(tmp_path, tmp_path, max_epoch=1,
                                 **voc_fields)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    # untrained tiny generator export (architecture from the same hp)
    from transformer_tts_tpu.vocoder.trainer import export_generator
    _, voc_state, gen, _ = tiny_state()
    voc_dir = export_generator(str(tmp_path / "voc"), voc_state)

    from transformer_tts_tpu.infer.engine import TTSEngine
    engine = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                       text_buckets=(8,), vocoder=voc_dir)
    engine.warmup()                    # includes the vocoder signatures
    r = engine.synthesize([[1, 2, 3], [4, 5, 6, 7]])
    for item in r:
        assert "audio" in item
        assert item["audio"].shape == (
            item["mel"].shape[0] * gen.hop_length,)
        assert item["audio"].dtype == np.float32

    # wav JSON responses carry the neural-vocoded audio
    from transformer_tts_tpu.infer.server import _result_to_json
    if r[0]["mel"].shape[0] > 0:
        out = _result_to_json(r[0], wav=True, mel_dim=MEL_DIM,
                              sample_rate=800, hop_length=8)
        assert "wav_base64" in out
        import base64
        import io
        import wave as wave_mod
        with wave_mod.open(
                io.BytesIO(base64.b64decode(out["wav_base64"]))) as fh:
            assert fh.getnframes() == r[0]["audio"].shape[0]

    # export includes vocoder artifacts: the deployable unit is the
    # full text -> mel -> waveform pipeline, no Python model code
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    out_dir = str(tmp_path / "exported")
    manifest = engine.export(out_dir)
    assert manifest["vocoder"]["hop_length"] == gen.hop_length
    (budget, entry), = manifest["vocoder"]["budgets"].items()
    with open(f"{out_dir}/{entry['file']}", "rb") as fh:
        vexp = jexport.deserialize(fh.read())
    mel = np.random.RandomState(1).randn(
        2, int(budget), MEL_DIM).astype(np.float32)
    wav_x = np.asarray(jax.jit(vexp.call)(mel))
    _, voc_apply, voc_vars = engine._vocoder
    wav_e = np.asarray(voc_apply(voc_vars, jnp.asarray(mel)))
    np.testing.assert_allclose(wav_x, wav_e, atol=1e-5)


@pytest.mark.slow
def test_engine_family_matrix(tmp_path):
    """Serve-or-refuse over every architecture: every snapshot either
    serves its FULL synthesis semantics or the constructor raises —
    nothing silently serves a degraded output (VERDICT r3 #7).

    Matrix: FS2 (plain + post_model-fused), text-mel-mel integrate,
    bare mel-mel snapshot (refused), tacotron2 decoder (refused),
    GST without ref_mel (refused) / with ref_mel (served)."""
    from tests.test_cli import write_hp, MEL_DIM
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.infer.engine import TTSEngine

    rs = np.random.RandomState(0)
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
    (tmp_path / "test.txt").write_text(lines[0] + "\n")

    # FS2 teacher — enough epochs that durations round to >= 1 frame
    hp_path, save_dir = write_hp(tmp_path, tmp_path, max_epoch=8)
    cli_train.main(["--hp_file", hp_path])

    # mel-mel student on the frozen teacher
    post_dir = str(tmp_path / "post_ckpt")
    hp2, _ = write_hp(tmp_path, tmp_path, max_epoch=1,
                      architecture="mel-mel", version=3, phone_embed=True,
                      n_layer_post_model=1, pretrain_model=str(save_dir),
                      save_dir=post_dir)
    cli_train.main(["--hp_file", hp2])

    # bare mel-mel snapshot: refused with instructions
    with pytest.raises(ValueError, match="mel-mel"):
        TTSEngine(post_dir, batch_size=2, text_buckets=(8,))

    # FS2 + fused post model: same shapes, different (refined) values
    texts = [[1, 2, 3, 4]]
    eng_plain = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                          text_buckets=(8,))
    r_plain = eng_plain.synthesize(texts)[0]
    eng_post = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                         text_buckets=(8,), post_model=post_dir)
    r_post = eng_post.synthesize(texts)[0]
    assert r_post["mel"].shape == r_plain["mel"].shape
    assert np.isfinite(r_post["mel"]).all()
    if r_plain["mel"].shape[0] > 0:
        assert not np.allclose(r_post["mel"], r_plain["mel"])
    with pytest.raises(NotImplementedError, match="refinement"):
        list(eng_post.synthesize_streaming([1, 2, 3]))

    # integrate (text-mel-mel) snapshot: served through the joint model
    int_dir = str(tmp_path / "int_ckpt")
    # enough epochs that the duration head rounds to >= 1 frame/phone
    # (exp(0)-1 = 0 untrained); 8 sufficed for the CLI test's corpus,
    # this one needs a little more
    hp3, _ = write_hp(tmp_path, tmp_path, max_epoch=20,
                      architecture="text-mel-mel", version=3,
                      phone_embed=True, postnet_pred=False,
                      n_layer_post_model=1, save_per_epoch=20,
                      save_dir=int_dir)
    cli_train.main(["--hp_file", hp3])
    eng_int = TTSEngine(int_dir, batch_size=2, frames_per_phone=4,
                        text_buckets=(8,))
    r_int = eng_int.synthesize(texts)[0]
    assert r_int["mel"].ndim == 2 and r_int["mel"].shape[1] == MEL_DIM
    assert r_int["mel"].shape[0] > 0 and np.isfinite(r_int["mel"]).all()
    with pytest.raises(NotImplementedError, match="refinement"):
        list(eng_int.synthesize_streaming([1, 2, 3]))
    # joint snapshots carry their own post model
    with pytest.raises(ValueError, match="joint"):
        TTSEngine(int_dir, batch_size=2, text_buckets=(8,),
                  post_model=post_dir)

    # tacotron2 decoder: refused at construction (before any restore)
    taco_dir = tmp_path / "taco"
    taco_dir.mkdir()
    (taco_dir / "hparams.py").write_text(
        "architecture = 'text-mel'\nmodel = 'Transformer'\n"
        "decoder_type = 'tacotron2'\nvocab_size = 20\nmel_dim = "
        f"{MEL_DIM}\n")
    with pytest.raises(ValueError, match="tacotron2"):
        TTSEngine(str(taco_dir), batch_size=2, text_buckets=(8,))

    # GST: refused without a style reference, served with one
    ar_dir = str(tmp_path / "ar_gst")
    hp4, _ = write_hp(tmp_path, tmp_path, model="Transformer",
                      max_epoch=1, reduction_rate=2,
                      ff_conv_kernel_size_decoder=1, gst=True,
                      save_dir=ar_dir)
    cli_train.main(["--hp_file", hp4])
    with pytest.raises(ValueError, match="ref_mel"):
        TTSEngine(ar_dir, batch_size=2, text_buckets=(8,))
    ref = tmp_path / "style_ref.npy"
    np.save(ref, rs.randn(12, MEL_DIM).astype(np.float32))
    eng_gst = TTSEngine(ar_dir, batch_size=2, frames_per_phone=4,
                        text_buckets=(8,), ref_mel=str(ref))
    r_gst = eng_gst.synthesize(texts)[0]
    assert r_gst["mel"].ndim == 2 and np.isfinite(r_gst["mel"]).all()
    # AR snapshots reject post_model (they have their own causal postnet)
    with pytest.raises(ValueError, match="post_model|causal postnet"):
        TTSEngine(ar_dir, batch_size=2, text_buckets=(8,),
                  post_model=post_dir, ref_mel=str(ref))
