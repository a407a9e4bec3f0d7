"""On-device log-mel extraction tests (vs an independent numpy oracle)."""

import numpy as np
import jax.numpy as jnp

from transformer_tts_tpu.ops.melspectrogram import (
    log_mel_spectrogram, mel_filterbank, hz_to_mel, mel_to_hz,
    compute_corpus_stats)


def numpy_logmel(audio, sr=22050, n_fft=512, hop=128, n_mels=20):
    """Straight-line numpy reimplementation (loop-based framing)."""
    pad = n_fft // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    win = np.hanning(n_fft + 1)[:-1]
    fb = mel_filterbank(n_mels, n_fft, sr)
    out = np.zeros((n_frames, n_mels))
    for t in range(n_frames):
        frame = x[t * hop: t * hop + n_fft] * win
        power = np.abs(np.fft.rfft(frame)) ** 2
        out[t] = np.log(np.maximum(fb @ power, 1e-10))
    return out


def test_mel_scale_roundtrip():
    f = np.array([0.0, 440.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(80, 1024, 22050)
    assert fb.shape == (80, 513)
    # every filter has some mass; interior bins covered
    assert (fb.sum(axis=1) > 0).all()
    assert (fb[:, 5:-5].sum(axis=0) > 0).any()


def test_log_mel_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    audio = rs.randn(2048).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), sample_rate=22050, n_fft=512, hop_length=128,
        n_mels=20))
    ref = numpy_logmel(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_log_mel_batched_and_frame_count():
    audio = jnp.zeros((3, 2560))
    out = log_mel_spectrogram(audio, n_fft=512, hop_length=256, n_mels=8)
    assert out.shape == (3, 2560 // 256 + 1, 8)
    # silence -> log floor
    np.testing.assert_allclose(np.asarray(out), np.log(1e-10), rtol=1e-5)


def test_pure_tone_peaks_at_expected_mel():
    sr, n_fft, hop = 22050, 1024, 256
    t = np.arange(sr // 4) / sr
    tone = np.sin(2 * np.pi * 880.0 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(
        jnp.asarray(tone), sample_rate=sr, n_fft=n_fft, hop_length=hop,
        n_mels=80))
    peak_bin = int(mel[mel.shape[0] // 2].argmax())
    # 880 Hz -> which mel filter center is closest?
    fb = mel_filterbank(80, n_fft, sr)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    centers = freqs[fb.argmax(axis=1)]
    expect = int(np.abs(centers - 880.0).argmin())
    assert abs(peak_bin - expect) <= 1


def test_compute_corpus_stats_ignores_padding():
    rs = np.random.RandomState(1)
    mels = rs.randn(2, 10, 4).astype(np.float32)
    mels[0, 6:] = 99.0  # padding garbage
    mels[1, 8:] = -99.0
    lengths = jnp.array([6, 8])
    mean, var = compute_corpus_stats(jnp.asarray(mels), lengths)
    valid = np.concatenate([mels[0, :6], mels[1, :8]], axis=0)
    np.testing.assert_allclose(np.asarray(mean), valid.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), valid.var(0), rtol=1e-4)


def test_audio_to_gst_style_chain():
    """Raw audio -> on-device log-mel -> GST style embedding, one jit.

    Demonstrates the north-star serving path: style conditioning from a
    reference WAV without offline feature extraction.
    """
    import jax
    from transformer_tts_tpu.models.gst import StyleEmbedding

    sr, n_mels = 22050, 16
    model = StyleEmbedding(mel_dim=n_mels, d_model=32)
    rs = np.random.RandomState(0)
    audio = jnp.asarray(rs.randn(2, sr // 2).astype(np.float32) * 0.1)

    def style_from_audio(variables, audio):
        mel = log_mel_spectrogram(audio, sample_rate=sr, n_fft=512,
                                  hop_length=256, n_mels=n_mels)
        return model.apply(variables, mel, train=False)

    mel0 = log_mel_spectrogram(audio, sample_rate=sr, n_fft=512,
                               hop_length=256, n_mels=n_mels)
    variables = model.init(jax.random.PRNGKey(0), mel0, train=False)
    style = jax.jit(style_from_audio)(variables, audio)
    assert style.shape == (2, 1, 32)
    assert np.isfinite(np.asarray(style)).all()


def test_griffin_lim_reconstructs_tone():
    """log-mel of a pure tone -> Griffin-Lim -> dominant frequency kept."""
    from transformer_tts_tpu.ops.melspectrogram import (
        griffin_lim_from_log_mel)
    sr, n_fft, hop, n_mels = 22050, 1024, 256, 80
    t = np.arange(sr // 2) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(tone), sample_rate=sr,
                              n_fft=n_fft, hop_length=hop, n_mels=n_mels)
    audio = np.asarray(griffin_lim_from_log_mel(
        mel, sample_rate=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
        n_iter=16, n_samples=len(tone)))
    assert audio.shape == tone.shape
    assert np.isfinite(audio).all()
    spec = np.abs(np.fft.rfft(audio))
    freqs = np.fft.rfftfreq(len(audio), 1 / sr)
    peak_freq = freqs[spec.argmax()]
    assert abs(peak_freq - 440.0) < 40.0, peak_freq
