"""On-device log-mel feature extraction.

The reference consumes mels precomputed offline (npy/HTK files); the
north-star design (BASELINE.json) moves log-mel extraction and mean/var
normalization on-device so raw audio can be featurized as part of the
jitted pipeline (e.g. GST reference mels at serving time, or end-to-end
data preprocessing on TPU).

Pipeline: pre-emphasis (optional) -> center-padded framing -> Hann window
-> rFFT -> power spectrum -> mel filterbank (HTK-formula triangular
filters) -> log. All static-shaped; the filterbank is a trace-time
constant matmul that lands on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def hz_to_mel(f):
    """HTK mel scale (2595 * log10(1 + f/700))."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: float,
                   fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filter matrix (HTK mel scale)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_bins), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.partial(jax.jit, static_argnames=(
    "n_fft", "hop_length", "win_length", "n_mels", "sample_rate",
    "fmin", "fmax", "center", "log_offset"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    *,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: Optional[int] = None,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    center: bool = True,
    log_offset: float = 1e-10,
) -> jnp.ndarray:
    """(..., N) waveform -> (..., T, n_mels) natural-log mel power.

    T = N // hop_length + 1 with ``center`` (reflect-padded), matching the
    common librosa/taco framing convention.
    """
    win_length = win_length or n_fft
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    b, n = audio.shape

    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (audio.shape[1] - n_fft) // hop_length

    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = audio[:, idx]                              # (B, T, n_fft)

    window = jnp.asarray(np.hanning(win_length + 1)[:-1], jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, None, :]

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2                          # (B, T, n_bins)

    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate, fmin,
                                    fmax))
    mel = jnp.einsum("btf,mf->btm", power.astype(jnp.float32), fb)
    out = jnp.log(jnp.maximum(mel, log_offset))
    return out[0] if squeeze else out


def compute_corpus_stats(mels: jnp.ndarray, lengths: jnp.ndarray):
    """Per-corpus (mean, var) over valid frames of a padded (B, T, D)
    batch — the on-device equivalent of the reference's offline
    mean.npy/var.npy generation."""
    valid = (jnp.arange(mels.shape[1])[None, :]
             < lengths[:, None])[..., None]
    n = jnp.maximum(valid.sum(), 1)
    mean = (mels * valid).sum(axis=(0, 1)) / n
    var = (((mels - mean) ** 2) * valid).sum(axis=(0, 1)) / n
    return mean, var


def _stft(frames_audio, n_fft, hop_length, window):
    """(B, N) -> (B, T, n_bins) complex, center-padded framing."""
    pad = n_fft // 2
    x = jnp.pad(frames_audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = x[:, idx] * window[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def _istft(spec, n_fft, hop_length, window, n_samples):
    """(B, T, n_bins) complex -> (B, n_samples) via windowed overlap-add."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, None, :]
    b, t, _ = frames.shape
    pad = n_fft // 2
    total = (t - 1) * hop_length + n_fft
    idx = (jnp.arange(t)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    audio = jnp.zeros((b, total), frames.dtype)
    audio = audio.at[:, idx].add(frames.reshape(b, -1))
    wsum = jnp.zeros((total,), jnp.float32)
    wsum = wsum.at[idx].add(jnp.tile(window ** 2, (t,)))
    audio = audio / jnp.maximum(wsum, 1e-8)[None, :]
    return audio[:, pad: pad + n_samples]


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "n_fft", "hop_length", "n_mels", "fmin", "fmax",
    "n_iter", "n_samples", "power"))
def griffin_lim_from_log_mel(
    log_mel: jnp.ndarray,
    *,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    n_iter: int = 32,
    n_samples: Optional[int] = None,
    power: float = 2.0,
) -> jnp.ndarray:
    """(B, T, n_mels) natural-log mel -> (B, n_samples) waveform.

    On-device Griffin-Lim phase recovery: the mel power spectrum is
    mapped back to linear frequency with the (normalized-transpose)
    pseudo-inverse of the mel filterbank, then n_iter rounds of
    STFT <-> ISTFT projection refine a zero phase estimate. The reference
    stops at .npy mels and relies on an external vocoder; this closes the
    loop for listening tests without one (a neural vocoder still sounds
    better — this is the built-in fallback).
    """
    squeeze = log_mel.ndim == 2
    if squeeze:
        log_mel = log_mel[None]
    b, t, _ = log_mel.shape
    if n_samples is None:
        # forward framing yields T = N//hop + 1, so T frames roundtrip
        # to (T-1)*hop samples
        n_samples = (t - 1) * hop_length

    fb = mel_filterbank(n_mels, n_fft, sample_rate, fmin, fmax)
    # row-normalized transpose as pseudo-inverse (standard mel inversion)
    fb_t = fb.T / np.maximum(fb.sum(axis=1)[None, :], 1e-8)
    mel_power = jnp.exp(log_mel.astype(jnp.float32))
    lin_power = jnp.einsum("btm,fm->btf", mel_power, jnp.asarray(fb_t))
    mag = jnp.maximum(lin_power, 1e-10) ** (1.0 / power)

    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)

    def body(_, spec_phase):
        audio = _istft(mag * jnp.exp(1j * spec_phase), n_fft, hop_length,
                       window, n_samples)
        spec = _stft(audio, n_fft, hop_length, window)
        return jnp.angle(spec)

    phase0 = jnp.zeros_like(mag)
    phase = jax.lax.fori_loop(0, n_iter, body, phase0)
    audio = _istft(mag * jnp.exp(1j * phase), n_fft, hop_length, window,
                   n_samples)
    peak = jnp.max(jnp.abs(audio), axis=1, keepdims=True)
    audio = audio / jnp.maximum(peak, 1e-8) * 0.95
    return audio[0] if squeeze else audio
