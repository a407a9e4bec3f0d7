"""On-device acoustic feature extraction: f0 (YIN) and energy.

The reference consumes precomputed ``*_f0.npy`` / ``*_energy.npy``
siblings (datasets_fastspeech2.py:19-174) and never shows how to make
them — every user re-scripts the DSP offline. Here the whole corpus
pipeline runs as batched XLA on the accelerator (see also
``ops/melspectrogram.py``):

* ``energy_per_frame``: L2 norm of the STFT magnitude per frame — the
  FastSpeech 2 paper's energy definition, framed identically to
  ``log_mel_spectrogram`` so the three feature streams stay aligned.
* ``yin_f0``: the YIN pitch tracker (de Cheveigné & Kawahara 2002,
  difference function -> cumulative-mean-normalized difference ->
  absolute threshold), vectorized over frames with the autocorrelation
  computed by FFT. Unvoiced frames (no CMNDF dip below the voicing
  threshold) return 0.0 — the same convention the reference's corpora
  use (f0=0 at unvoiced frames feeds the pitch-bin embedding's bucket 0).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def _frame(audio: jnp.ndarray, frame_length: int, hop_length: int,
           center: bool) -> jnp.ndarray:
    """(B, N) -> (B, T, frame_length), framing as log_mel_spectrogram."""
    if center:
        pad = frame_length // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (audio.shape[1] - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return audio[:, idx]


def energy_per_frame(
    audio: jnp.ndarray,
    *,
    n_fft: int = 1024,
    hop_length: int = 256,
    center: bool = True,
) -> jnp.ndarray:
    """(..., N) waveform -> (..., T) per-frame STFT-magnitude L2 norm."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    frames = _frame(audio, n_fft, hop_length, center)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    energy = jnp.sqrt(jnp.sum(jnp.abs(spec) ** 2, axis=-1))
    return energy[0] if squeeze else energy


def yin_f0(
    audio: jnp.ndarray,
    *,
    sample_rate: int = 22050,
    frame_length: int = 2048,
    hop_length: int = 256,
    f0_min: float = 71.0,
    f0_max: float = 795.8,
    threshold: float = 0.1,
    voicing_threshold: float = 0.45,
    center: bool = True,
) -> jnp.ndarray:
    """(..., N) waveform -> (..., T) f0 in Hz (0.0 where unvoiced).

    Classic YIN over half-overlapping comparison windows: for each frame
    of ``frame_length`` samples, the difference function

        d(tau) = sum_{j<H} (x[j] - x[j+tau])^2,   H = frame_length // 2

    is computed via one FFT cross-correlation per frame, normalized to
    the CMNDF d'(tau) = d(tau) * tau / cumsum(d)(tau), and the pitch lag
    is the first tau with d' < threshold (fallback: argmin d'). Frames
    whose best d' exceeds ``voicing_threshold`` are unvoiced -> 0.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    half = frame_length // 2
    tau_min = max(int(sample_rate / f0_max), 2)
    tau_max = min(int(np.ceil(sample_rate / f0_min)), half - 1)

    frames = _frame(audio.astype(jnp.float32), frame_length, hop_length,
                    center)                              # (B, T, W)
    b, t, w = frames.shape
    x = frames.reshape(b * t, w)

    # d(tau) = e0 + e(tau) - 2 c(tau), taus 0..tau_max
    # c(tau): cross-correlation of x with its first half, by FFT
    n_fft = int(2 ** np.ceil(np.log2(w + half)))
    fx = jnp.fft.rfft(x, n=n_fft)
    fh = jnp.fft.rfft(x[:, :half], n=n_fft)
    corr = jnp.fft.irfft(fx * jnp.conj(fh), n=n_fft)[:, :tau_max + 1]
    sq = x * x
    csum = jnp.cumsum(
        jnp.pad(sq, ((0, 0), (1, 0))), axis=-1)          # (B*T, W+1)
    e0 = csum[:, half] - csum[:, 0]                      # energy of x[0:H]
    # e(tau) = energy of x[tau:tau+H]
    taus = jnp.arange(tau_max + 1)
    e_tau = csum[:, taus + half] - csum[:, taus]
    d = e0[:, None] + e_tau - 2.0 * corr                 # (B*T, tau_max+1)
    d = jnp.maximum(d, 0.0)

    # CMNDF
    run = jnp.cumsum(d[:, 1:], axis=-1)
    cmndf = d[:, 1:] * jnp.arange(1, tau_max + 1) / jnp.maximum(run, 1e-12)
    cmndf = jnp.concatenate(
        [jnp.ones((b * t, 1), cmndf.dtype), cmndf], axis=-1)

    valid = (taus >= tau_min)[None, :]
    cm = jnp.where(valid, cmndf, jnp.inf)
    # candidate lags are local minima (troughs) of the CMNDF — taking the
    # raw first-below-threshold sample lands on the dip's leading edge
    # and biases the pitch sharp
    left = jnp.pad(cm[:, :-1], ((0, 0), (1, 0)),
                   constant_values=jnp.inf)
    right = jnp.pad(cm[:, 1:], ((0, 0), (0, 1)),
                    constant_values=jnp.inf)
    trough = (cm <= left) & (cm <= right)
    below = trough & (cm < threshold)
    any_below = below.any(axis=-1)
    first_below = jnp.argmax(below, axis=-1)
    best = jnp.argmin(cm, axis=-1)           # global min is a trough
    tau = jnp.where(any_below, first_below, best)

    # parabolic interpolation around the chosen lag (standard YIN step)
    t0 = jnp.clip(tau, tau_min, tau_max)
    tm = jnp.clip(t0 - 1, 0, tau_max)
    tp = jnp.clip(t0 + 1, 0, tau_max)
    rows = jnp.arange(b * t)
    dm, d0, dp = cmndf[rows, tm], cmndf[rows, t0], cmndf[rows, tp]
    denom = dm + dp - 2.0 * d0
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (dm - dp) / jnp.where(
                          jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    period = t0.astype(jnp.float32) + shift

    voiced = (cm[rows, t0] < voicing_threshold) & (e0 > 1e-8)
    f0 = jnp.where(voiced, sample_rate / jnp.maximum(period, 1.0), 0.0)
    f0 = f0.reshape(b, t)
    return f0[0] if squeeze else f0


def read_wav(path: str,
             expected_rate: Optional[int] = None) -> "tuple[np.ndarray, int]":
    """PCM WAV -> (float32 mono waveform in [-1, 1], sample_rate).

    Stdlib-only (the environment has no soundfile); 16/32-bit PCM and
    8-bit unsigned are supported, multi-channel is averaged to mono.
    """
    import wave

    with wave.open(path, "rb") as fh:
        rate = fh.getframerate()
        n = fh.getnframes()
        width = fh.getsampwidth()
        channels = fh.getnchannels()
        raw = fh.readframes(n)
    if expected_rate is not None and rate != expected_rate:
        raise ValueError(
            f"{path}: sample rate {rate} != expected {expected_rate} "
            "(resample offline; the extractor does not resample)")
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"{path}: unsupported sample width {width}")
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return data, rate
