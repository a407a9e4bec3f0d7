"""ctypes binding for the native data engine (native/tts_data.cpp).

Compiles the shared library on first use (``make -C native``) and caches
it. Every entry point has a transparent numpy fallback, so the framework
works even without a C++ toolchain — the native path exists because on a
small host feeding a fast chip, per-utterance Python overhead in the data
plane becomes the training bottleneck.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtts_data.so")

_lib = None
_lib_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.tts_load_htk.restype = ctypes.c_int
        lib.tts_load_htk.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int,
                                     ctypes.c_int, f32p, f32p]
        lib.tts_load_npy.restype = ctypes.c_int
        lib.tts_load_npy.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int,
                                     ctypes.c_int, f32p, f32p]
        lib.tts_pad_mel_batch.restype = None
        lib.tts_pad_mel_batch.argtypes = [
            ctypes.POINTER(f32p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p]
        lib.tts_load_mel_batch.restype = None
        lib.tts_load_mel_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p, f32p,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load_library() is not None


def _fptr(arr: Optional[np.ndarray]):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_mel_normalized(path: str, mel_dim: int,
                        mean: Optional[np.ndarray] = None,
                        var: Optional[np.ndarray] = None,
                        max_frames: int = 1 << 16) -> Optional[np.ndarray]:
    """Fused load (+normalize) of an npy/htk mel; None -> caller fallback."""
    lib = _load_library()
    if lib is None:
        return None
    mean_f = np.ascontiguousarray(mean, np.float32).reshape(-1) \
        if mean is not None else None
    var_f = np.ascontiguousarray(var, np.float32).reshape(-1) \
        if var is not None else None
    out = np.empty((max_frames, mel_dim), np.float32)
    if path.endswith(".npy") or ".npy" in path:
        n = lib.tts_load_npy(path.encode(), _fptr(out), max_frames,
                             mel_dim, _fptr(mean_f), _fptr(var_f))
    elif ".htk" in path:
        n = lib.tts_load_htk(path.encode(), _fptr(out), max_frames,
                             mel_dim, _fptr(mean_f), _fptr(var_f))
    else:
        return None
    if n < 0:
        return None
    return out[:n].copy()


_probe_buffers = __import__("threading").local()


def _probe_buffer(shape):
    """Per-thread reusable output buffer (a fresh 40+MB np.empty per
    batch costs mmap/munmap + page faults; loader pool threads each
    consume their batch before the next call, so per-thread reuse is
    safe — collate copies the mel views out immediately)."""
    buf = getattr(_probe_buffers, "buf", None)
    if buf is None or buf.shape[1:] != shape[1:] or buf.shape[0] < shape[0]:
        buf = np.empty(shape, np.float32)
        _probe_buffers.buf = buf
    return buf[:shape[0]]


def load_mel_batch(paths, max_len: int, mel_dim: int, pad: float,
                   mean: Optional[np.ndarray] = None,
                   var: Optional[np.ndarray] = None,
                   n_threads: int = 8, fill_tail: bool = True):
    """One native call: N threads load+normalize+pad a whole batch.

    Returns (out (B, max_len, mel_dim) float32, lengths (B,) int32) or
    None -> caller falls back. lengths[i] == -1 marks a per-utterance
    failure (unsupported layout) — the caller reloads just that row.
    """
    lib = _load_library()
    if lib is None or not paths:
        return None
    mean_f = np.ascontiguousarray(mean, np.float32).reshape(-1) \
        if mean is not None else None
    var_f = np.ascontiguousarray(var, np.float32).reshape(-1) \
        if var is not None else None
    b = len(paths)
    out = _probe_buffer((b, max_len, mel_dim))
    lengths = (ctypes.c_int * b)()
    c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.tts_load_mel_batch(c_paths, b, _fptr(out), max_len, mel_dim,
                           ctypes.c_float(pad), _fptr(mean_f),
                           _fptr(var_f), n_threads, lengths,
                           1 if fill_tail else 0)
    return out, np.frombuffer(lengths, np.int32).copy()


def pad_mel_batch(mels, max_len: int, pad: float) -> Optional[np.ndarray]:
    """Ragged list of (T_i, D) float32 -> (B, max_len, D), native pass."""
    lib = _load_library()
    if lib is None or not mels:
        return None
    dim = mels[0].shape[1]
    batch = len(mels)
    arrs = [np.ascontiguousarray(m, np.float32) for m in mels]
    ptrs = (ctypes.POINTER(ctypes.c_float) * batch)(
        *[_fptr(a) for a in arrs])
    lengths = (ctypes.c_int * batch)(*[a.shape[0] for a in arrs])
    out = np.empty((batch, max_len, dim), np.float32)
    lib.tts_pad_mel_batch(ptrs, lengths, batch, max_len, dim,
                          ctypes.c_float(pad), _fptr(out))
    return out
