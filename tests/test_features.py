"""f0 / energy extraction + prepare_data CLI tests."""

import os
import wave

import numpy as np
import pytest


def _write_wav(path, audio, rate=22050):
    pcm = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(pcm.tobytes())


def test_yin_tracks_sine_pitch():
    from transformer_tts_tpu.ops.features import yin_f0
    sr = 22050
    t = np.arange(sr)  # 1 s
    for hz in (110.0, 220.0, 440.0):
        audio = 0.5 * np.sin(2 * np.pi * hz * t / sr).astype(np.float32)
        f0 = np.asarray(yin_f0(audio, sample_rate=sr))
        # interior frames (edges see the reflect pad)
        mid = f0[8:-8]
        voiced = mid[mid > 0]
        assert voiced.size > 0.9 * mid.size
        assert abs(np.median(voiced) - hz) < 0.02 * hz


def test_yin_silence_is_unvoiced():
    from transformer_tts_tpu.ops.features import yin_f0
    f0 = np.asarray(yin_f0(np.zeros(22050, np.float32)))
    assert (f0 == 0.0).all()


def test_feature_streams_share_framing():
    from transformer_tts_tpu.ops.features import energy_per_frame, yin_f0
    from transformer_tts_tpu.ops.melspectrogram import log_mel_spectrogram
    rs = np.random.RandomState(0)
    audio = rs.randn(22050).astype(np.float32) * 0.1
    mel = np.asarray(log_mel_spectrogram(audio))
    f0 = np.asarray(yin_f0(audio))
    energy = np.asarray(energy_per_frame(audio))
    assert mel.shape[0] == f0.shape[0] == energy.shape[0]
    assert np.isfinite(mel).all() and np.isfinite(energy).all()
    assert (energy >= 0).all()


def test_energy_scales_with_amplitude():
    from transformer_tts_tpu.ops.features import energy_per_frame
    sr = 22050
    t = np.arange(sr)
    quiet = 0.1 * np.sin(2 * np.pi * 220 * t / sr).astype(np.float32)
    loud = 0.4 * np.sin(2 * np.pi * 220 * t / sr).astype(np.float32)
    eq = np.asarray(energy_per_frame(quiet)).mean()
    el = np.asarray(energy_per_frame(loud)).mean()
    assert el / eq == pytest.approx(4.0, rel=0.05)


def test_read_wav_roundtrip(tmp_path):
    from transformer_tts_tpu.ops.features import read_wav
    audio = (np.sin(np.linspace(0, 50, 4000)) * 0.3).astype(np.float32)
    _write_wav(tmp_path / "a.wav", audio)
    got, rate = read_wav(str(tmp_path / "a.wav"), expected_rate=22050)
    assert rate == 22050
    np.testing.assert_allclose(got, audio, atol=1e-4)
    with pytest.raises(ValueError, match="sample rate"):
        read_wav(str(tmp_path / "a.wav"), expected_rate=16000)


@pytest.mark.slow
def test_prepare_data_cli_feeds_training(tmp_path):
    """WAVs -> prepare_data -> AR Transformer-TTS trains one epoch."""
    from transformer_tts_tpu.cli import prepare_data
    sr = 22050
    rs = np.random.RandomState(0)
    lines = []
    for i in range(3):
        n = sr // 4 + i * 1000
        t = np.arange(n)
        audio = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t / sr)
                 + 0.01 * rs.randn(n)).astype(np.float32)
        wav = tmp_path / f"utt{i}.wav"
        _write_wav(wav, audio, sr)
        ids = " ".join(str(x) for x in rs.randint(1, 20, 6))
        lines.append(f"{wav}|{ids}")
    (tmp_path / "wavs.txt").write_text("\n".join(lines) + "\n")

    out_dir = tmp_path / "features"
    prepare_data.main(["--wav_script", str(tmp_path / "wavs.txt"),
                       "--out_dir", str(out_dir), "--n_mels", "8"])

    script = out_dir / "train_script.txt"
    assert script.exists()
    for i in range(3):
        mel = np.load(out_dir / f"utt{i}.npy")
        f0 = np.load(out_dir / f"utt{i}_f0.npy")
        en = np.load(out_dir / f"utt{i}_energy.npy")
        assert mel.shape[1] == 8
        assert mel.shape[0] == f0.shape[0] == en.shape[0]
        voiced = f0[f0 > 0]
        assert abs(np.median(voiced) - (150 + 40 * i)) < 10
    mean = np.load(out_dir / "mean.npy")
    var = np.load(out_dir / "var.npy")
    assert mean.shape == (8,) and (var > 0).all()
    assert np.load(out_dir / "lengths.npy").shape == (3,)

    # the produced corpus trains the (duration-free) AR family
    from tests.test_cli import write_hp
    from transformer_tts_tpu.cli import train as cli_train
    hp_path, save_dir = write_hp(
        tmp_path, tmp_path, model="Transformer", max_epoch=1,
        reduction_rate=1, ff_conv_kernel_size_decoder=1,
        train_script=str(script), test_script=str(script),
        mean_file=str(out_dir / "mean.npy"),
        var_file=str(out_dir / "var.npy"))
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(save_dir, "epoch_1"))


def test_read_wav_stereo_and_8bit(tmp_path):
    from transformer_tts_tpu.ops.features import read_wav
    # stereo int16: channels average to mono
    left = (np.sin(np.linspace(0, 20, 800)) * 0.4).astype(np.float32)
    right = -left
    inter = np.empty(1600, np.int16)
    inter[0::2] = (left * 32767).astype(np.int16)
    inter[1::2] = (right * 32767).astype(np.int16)
    with wave.open(str(tmp_path / "st.wav"), "wb") as fh:
        fh.setnchannels(2)
        fh.setsampwidth(2)
        fh.setframerate(22050)
        fh.writeframes(inter.tobytes())
    mono, rate = read_wav(str(tmp_path / "st.wav"))
    assert rate == 22050 and mono.shape == (800,)
    assert np.abs(mono).max() < 1e-4          # L + R cancel

    # 8-bit unsigned PCM
    audio8 = ((np.sin(np.linspace(0, 20, 500)) * 0.5 + 1.0)
              * 128).astype(np.uint8)
    with wave.open(str(tmp_path / "u8.wav"), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(1)
        fh.setframerate(22050)
        fh.writeframes(audio8.tobytes())
    got, _ = read_wav(str(tmp_path / "u8.wav"))
    assert got.shape == (500,)
    np.testing.assert_allclose(
        got, (audio8.astype(np.float32) - 128) / 128.0, atol=1e-6)
