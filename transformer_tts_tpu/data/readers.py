"""Feature file readers and normalization.

Reference: mel loading for ``.npy`` / ``.htk`` / ``.mel`` extensions
(datasets_fastspeech2.py:103-115), the HTK binary header parse
(datasets_fastspeech2.py:54-64, utils/utils.py:68-88), and mean/var
normalization ``(mel - mean) / sqrt(var)``
(datasets_fastspeech2.py:155-157).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def load_htk(filename: str) -> np.ndarray:
    """Parse a 12-byte HTK header + big-endian float32 frames."""
    with open(filename, "rb") as fh:
        spam = fh.read(12)
        _, _, samp_size, _ = struct.unpack(">IIHH", spam)
        veclen = samp_size // 4
        fh.seek(12, 0)
        dat = np.fromfile(fh, dtype="float32")
    dat = dat.reshape(len(dat) // veclen, veclen)
    return dat.byteswap()


def load_mel(mel_name: str, mel_dim: int) -> np.ndarray:
    """(T, mel_dim) float32 mel from npy/htk/mel files."""
    if mel_name.endswith(".npy") or ".npy" in mel_name:
        mel = np.load(mel_name)
        if mel.shape[-1] != mel_dim:
            mel = mel.reshape(-1, mel_dim)
        return np.asarray(mel, np.float32)
    if ".htk" in mel_name:
        return np.asarray(load_htk(mel_name)[:, :mel_dim], np.float32)
    if ".mel" in mel_name:
        import torch  # torch-saved tensors; CPU torch is available
        t = torch.load(mel_name, map_location="cpu")
        return t.squeeze(0).transpose(0, 1).numpy().astype(np.float32)
    raise ValueError(f"unknown mel file extension: {mel_name}")


class Normalizer:
    """Per-corpus mean/var normalization (and its inverse)."""

    def __init__(self, mean_file: Optional[str], var_file: Optional[str],
                 mel_dim: int):
        if mean_file is not None and var_file is not None:
            self.mean = np.load(mean_file).reshape(-1, mel_dim)
            self.var = np.load(var_file).reshape(-1, mel_dim)
        else:
            self.mean = self.var = None

    @property
    def active(self) -> bool:
        return self.mean is not None

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        if not self.active:
            return mel
        return (mel - self.mean) / np.sqrt(self.var)

    def denormalize(self, mel: np.ndarray) -> np.ndarray:
        if not self.active:
            return mel
        return mel * np.sqrt(self.var) + self.mean

    def arrays(self) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        return self.mean, self.var
