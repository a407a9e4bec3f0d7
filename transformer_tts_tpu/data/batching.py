"""Collation to STATIC bucket shapes.

The reference pads each batch to its own max length
(datasets_fastspeech2.py:521-616) — on TPU that means one XLA compile per
distinct (batch, text_len, mel_len) triple. Here every batch is padded to
a shape from a small fixed bucket set (hp.text_buckets / hp.length_buckets
+ power-of-two batch sizes), bounding the number of compiles while keeping
the reference's frame-budget semantics.

Pad values match the reference exactly: text/pos 0, mel -0.5 (or -5.0
when unnormalized, datasets_transformer.py:410-415), stop-token 1.0,
f0/energy/alignment 0.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

MEL_PAD_NORMALIZED = -0.5
MEL_PAD_RAW = -5.0


def pick_bucket(value: int, buckets: Sequence[int], *,
                multiple: int = 1) -> int:
    """Smallest bucket >= value; beyond the largest, round up to a multiple
    of 128 (rare stragglers still get a static-ish shape)."""
    for b in sorted(buckets):
        if value <= b and b % multiple == 0:
            return b
    step = max(128, multiple)
    return -(-value // step) * step


def pick_batch_bucket(n: int, buckets: Sequence[int] = (1, 2, 4, 8, 16, 32,
                                                        64, 128),
                      multiple: int = 1) -> int:
    """Smallest power-of-two-ish bucket >= n that is a multiple of
    ``multiple`` (the data-mesh size, so batches shard evenly)."""
    for b in buckets:
        if n <= b and b % multiple == 0:
            return b
    step = max(128, multiple)
    return -(-n // step) * step


def _pad1(x: np.ndarray, length: int, value=0) -> np.ndarray:
    out = np.full((length,) + x.shape[1:], value, dtype=x.dtype)
    out[: len(x)] = x
    return out


def collate(
    samples: List[dict],
    hp,
    *,
    text_len: Optional[int] = None,
    mel_len: Optional[int] = None,
    batch: Optional[int] = None,
    pad_batch: bool = True,
    batch_multiple: int = 1,
) -> Dict[str, np.ndarray]:
    """Collate per-utterance dicts into a dict of static-shape arrays.

    Returns keys: text, pos_text, text_length, mel, pos_mel, mel_length,
    stop_token, alignment/f0/energy (when present), spk_emb/accent/gender/
    hop_size/spk_emb_post (when present), mel_name (list), pad_rows
    (number of real samples; padded rows duplicate sample 0 with
    zero pos masks so they contribute nothing to masked losses but note
    the reference losses average over padding anyway — padded rows are
    tracked for correct metric normalization).
    """
    from transformer_tts_tpu.config import is_nar_model
    r = 1 if is_nar_model(hp.model) else hp.reduction_rate
    mel_pad = MEL_PAD_NORMALIZED if hp.mean_file is not None \
        else MEL_PAD_RAW

    n_real = len(samples)
    tl = max(s["text_length"] for s in samples)
    text_len = text_len or pick_bucket(tl, hp.text_buckets)
    has_mel = "mel" in samples[0]
    if has_mel:
        ml = max(s["mel_length"] for s in samples)
        mel_len = mel_len or pick_bucket(ml, hp.length_buckets, multiple=r)
        mel_len = -(-mel_len // r) * r
    b = (pick_batch_bucket(n_real, multiple=batch_multiple)
         if pad_batch else n_real) if batch is None else batch

    out: Dict[str, np.ndarray] = {}
    text = np.zeros((b, text_len), np.int32)
    pos_text = np.zeros((b, text_len), np.int32)
    for i, s in enumerate(samples):
        text[i, : s["text_length"]] = s["text"]
        pos_text[i, : s["text_length"]] = np.arange(1, s["text_length"] + 1)
    out["text"] = text
    out["pos_text"] = pos_text
    out["text_length"] = np.array(
        [s["text_length"] for s in samples] + [0] * (b - n_real), np.int32)
    out["n_real"] = np.int32(n_real)
    out["mel_name"] = [s["mel_name"] for s in samples]

    if has_mel:
        mel_dim = samples[0]["mel"].shape[1]
        discrete = np.issubdtype(samples[0]["mel"].dtype, np.integer)
        if discrete:
            # dual-stream token codes; pad with the CE ignore_index
            # (train_fastspeech2.py:183 uses 320)
            mel = np.full((b, mel_len, mel_dim), 320, np.int32)
        else:
            mel = np.full((b, mel_len, mel_dim), mel_pad, np.float32)
        pos_mel = np.zeros((b, mel_len), np.int32)
        stop = np.ones((b, mel_len), np.float32)   # pad value 1.0
        for i, s in enumerate(samples):
            m = s["mel"]
            mel[i, : len(m)] = m
            pos_mel[i, : s["mel_length"]] = np.arange(
                1, s["mel_length"] + 1)
            stop[i, : len(m)] = 0.0
        out["mel"] = mel
        out["pos_mel"] = pos_mel
        out["mel_length"] = np.array(
            [s["mel_length"] for s in samples] + [0] * (b - n_real),
            np.int32)
        out["stop_token"] = stop

    # pregenerated teacher corpus (mel-mel, hp.teacher_suffix): per-frame
    # arrays padded to the same mel bucket as the target
    for key in ("teacher_mel", "teacher_phone"):
        if key in samples[0]:
            dim = samples[0][key].shape[1]
            pad = mel_pad if key == "teacher_mel" else 0.0
            arr = np.full((b, mel_len, dim), pad, np.float32)
            for i, s in enumerate(samples):
                v = s[key][:mel_len]
                arr[i, : len(v)] = v
            out[key] = arr

    for key, pad_val, dtype in (("alignment", 0, np.int32),
                                ("f0", 0.0, np.float32),
                                ("energy", 0.0, np.float32)):
        if key in samples[0]:
            length = text_len if key == "alignment" else mel_len
            arr = np.full((b, length), pad_val, dtype)
            for i, s in enumerate(samples):
                v = np.asarray(s[key], dtype)
                arr[i, : min(len(v), length)] = v[:length]
            out[key] = arr

    if "alignment" in out and has_mel:
        # clip total durations to the bucket (rare clamp at bucket edge)
        totals = out["alignment"].sum(axis=1)
        overflow = totals > mel_len
        if overflow.any():
            for i in np.where(overflow)[0]:
                d = out["alignment"][i]
                cum = np.cumsum(d)
                d[cum > mel_len] = 0
                edge = np.searchsorted(cum, mel_len, side="left")
                if edge < len(d):
                    prev = cum[edge - 1] if edge > 0 else 0
                    d[edge] = mel_len - prev

    if "spk_emb" in samples[0]:
        v0 = samples[0]["spk_emb"]
        if np.isscalar(v0) or isinstance(v0, int):
            arr = np.zeros((b,), np.int32)
            for i, s in enumerate(samples):
                arr[i] = s["spk_emb"]
        else:
            arr = np.zeros((b, len(v0)), np.float32)
            for i, s in enumerate(samples):
                arr[i] = s["spk_emb"]
        out["spk_emb"] = arr

    if "spk_emb_post" in samples[0]:
        v0 = samples[0]["spk_emb_post"]
        if np.isscalar(v0) or isinstance(v0, int):
            arr = np.zeros((b,), np.int32)
        else:
            arr = np.zeros((b, len(v0)), np.float32)
        for i, s in enumerate(samples):
            arr[i] = s["spk_emb_post"]
        out["spk_emb_post"] = arr

    if "accent" in samples[0]:
        arr = np.zeros((b, text_len), np.int32)
        for i, s in enumerate(samples):
            arr[i, : len(s["accent"])] = s["accent"]
        out["accent"] = arr
    if "gender" in samples[0]:
        out["gender"] = np.array(
            [s["gender"] for s in samples] + [0] * (b - n_real), np.int32)
    if "hop_size" in samples[0]:
        out["hop_size"] = np.array(
            [s["hop_size"] for s in samples] + [0] * (b - n_real), np.int32)
    return out
