"""Script-file dataset.

Reference: ``datasets/datasets_fastspeech2.py:19-174`` (TrainDatasets) and
``datasets/datasets_transformer.py:18-120``.

Script format: ``mel_path|text_ids[|spk_or_accent[|gender]]`` per line
(pipe-separated). Sibling files next to each mel ``X.npy``:
``X{tail_alignment}.npy`` (per-phone durations), ``X_f0.npy``,
``X_energy.npy``, ``X_xvector.npy``.

Per-sample processing (identical to reference):
* optional SentencePiece encode with bos/eos, else space-split int ids;
* mean/var normalization;
* FastSpeech2: mel as-is; AR transformer: a zero "go" frame is prepended
  and the length rounded up to ``reduction_rate``
  (datasets_transformer.py:93-96);
* 1-based ``pos_text`` / ``pos_mel``; stop-token zeros (padding fills 1.0
  at collate time).

This is a plain indexable object — batching/bucketing is the loader's job.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, List, Optional

import numpy as np

from transformer_tts_tpu.data.readers import Normalizer, load_mel


def _round_up(x: int, multiple: int) -> int:
    rem = x % multiple
    return x if rem == 0 else x + multiple - rem


def parse_script(path: str) -> List[List[str]]:
    """Parse the pipe-separated script file (no pandas dependency)."""
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            rows.append(line.split("|"))
    return rows


class TTSDataset:
    def __init__(self, script_path: str, hp, *, alignment_pred: bool = True,
                 pitch_pred: Optional[bool] = None,
                 energy_pred: Optional[bool] = None,
                 test_mode: bool = False):
        self.hp = hp
        self.rows = parse_script(script_path)
        self.test_mode = test_mode
        self.alignment_pred = alignment_pred and not test_mode
        self.pitch_pred = (hp.pitch_pred if pitch_pred is None
                           else pitch_pred) and not test_mode
        self.energy_pred = (hp.energy_pred if energy_pred is None
                            else energy_pred) and not test_mode
        self.normalizer = Normalizer(hp.mean_file, hp.var_file, hp.mel_dim)
        self.sp = None
        if hp.spm_model is not None:
            import sentencepiece as spm
            self.sp = spm.SentencePieceProcessor()
            self.sp.Load(hp.spm_model)
        from transformer_tts_tpu.config import is_nar_model
        self.is_ar = not is_nar_model(hp.model)

    def __len__(self) -> int:
        return len(self.rows)

    def _load_mel(self, mel_name: str) -> np.ndarray:
        """Fused native load+normalize when available; numpy fallback."""
        from transformer_tts_tpu.data import native
        mean, var = self.normalizer.arrays()
        out = native.load_mel_normalized(mel_name, self.hp.mel_dim,
                                         mean, var)
        if out is not None:
            return out
        return self.normalizer(load_mel(mel_name, self.hp.mel_dim))

    def _encode_text(self, text: str) -> np.ndarray:
        if self.sp is not None:
            ids = [self.sp.bos_id()] + self.sp.EncodeAsIds(text) \
                + [self.sp.eos_id()]
            return np.asarray(ids, np.int32)
        return np.asarray([int(t) for t in text.split(" ")], np.int32)

    def text_length(self, idx: int) -> int:
        return len(self._encode_text(self.rows[idx][1].strip()))

    def __getitem__(self, idx: int,
                    _preloaded_mel: Optional[np.ndarray] = None
                    ) -> Dict[str, Any]:
        hp = self.hp
        row = self.rows[idx]
        mel_name = row[0]
        text = self._encode_text(row[1].strip())

        sample: Dict[str, Any] = {
            "mel_name": mel_name,
            "text": text,
            "text_length": len(text),
        }

        if hp.use_hop:
            sample["hop_size"] = (1 if "hop256" in mel_name
                                  else 2 if "hop160" in mel_name else 0)

        if hp.is_multi_speaker:
            if hp.spk_emb_type == "speaker_id":
                sample["spk_emb"] = int(row[2])
            elif hp.spk_emb_type == "x_vector":
                sample["spk_emb"] = np.load(
                    mel_name.replace(".npy", "_xvector.npy").strip())
            else:
                raise ValueError(
                    f"unknown spk_emb_type: {hp.spk_emb_type}")

        if hp.accent_emb:
            sample["accent"] = np.asarray(
                [int(t) for t in row[2].split(" ")], np.int32)
        if hp.gender_emb:
            sample["gender"] = int(row[3])

        if hp.spk_emb_postprocess_type == "x_vector":
            sample["spk_emb_post"] = np.load(
                mel_name.replace(".npy", "_xvector.npy"))
        elif hp.spk_emb_postprocess_type == "speaker_id":
            sample["spk_emb_post"] = int(row[2])

        if self.test_mode:
            return sample

        if hp.output_type:
            # discrete dual-stream tokens (VQWav2vecTrainDatasets,
            # datasets_transformer.py:162-227): (T, 2) int codes, no
            # normalization, no go-frame. Variance targets (alignment/
            # f0/energy siblings) still load below — the FS2 softmax
            # trainer keeps duration/f0/energy losses
            # (train_fastspeech2.py:244-260).
            tokens = np.load(mel_name).astype(np.int32)
            if tokens.ndim == 1:
                tokens = tokens[:, None]
            sample["mel"] = tokens
            sample["mel_length"] = tokens.shape[0]
        else:
            mel = (_preloaded_mel if _preloaded_mel is not None
                   else self._load_mel(mel_name))
            if self.is_ar:
                mel = np.concatenate(
                    [np.zeros((1, hp.mel_dim), np.float32), mel], axis=0)
                mel_length = _round_up(mel.shape[0], hp.reduction_rate)
            else:
                mel_length = mel.shape[0]
            sample["mel"] = mel.astype(np.float32)
            sample["mel_length"] = mel_length

        if hp.architecture == "mel-mel" and hp.teacher_suffix:
            # pregenerated teacher corpus (cli/teacher_forcing): the
            # student input mel (normalized like the target) + the
            # optional per-frame phone features versions != (1,5) need
            sample["teacher_mel"] = self._load_mel(
                mel_name.replace(".npy", hp.teacher_suffix + ".npy"))
            phone_path = mel_name.replace(
                ".npy", hp.teacher_suffix + "_phone.npy")
            if os.path.exists(phone_path):
                sample["teacher_phone"] = np.load(phone_path).astype(
                    np.float32)

        tail = hp.tail_alignment + ".npy"
        if self.alignment_pred:
            sample["alignment"] = np.load(
                mel_name.replace(".npy", tail)).astype(np.int32)
        if self.pitch_pred:
            sample["f0"] = np.load(
                mel_name.replace(".npy", "_f0.npy")).astype(np.float32)
        if self.energy_pred:
            sample["energy"] = np.load(
                mel_name.replace(".npy", "_energy.npy")).astype(np.float32)
        return sample

    def load_batch_samples(self, indices, n_threads: int = 8):
        """Batch fetch with the native threaded mel loader.

        One C++ call loads + normalizes every mel of the batch in
        parallel (no GIL, no per-file Python round trip); metadata and
        the small sibling arrays stay in Python. Falls back to per-item
        ``__getitem__`` whenever inapplicable: AR (go-frame reshaping),
        discrete-token corpora, test mode, non-npy/htk containers, the
        library being unavailable, or any per-row load failure. Rows
        that fill the probe buffer completely are re-loaded through the
        exact path (possible truncation).

        Ownership: returned ``mel`` arrays are views into a per-thread
        reusable buffer — valid until this thread's NEXT call. Collate
        (the only in-tree consumer) copies them immediately.
        """
        from transformer_tts_tpu.data import native

        if (self.test_mode or self.is_ar or self.hp.output_type
                or not native.available()):
            return [self[i] for i in indices]
        paths = [self.rows[i][0] for i in indices]
        if not all(p.endswith(".npy") or ".htk" in p for p in paths):
            return [self[i] for i in indices]
        mean, var = self.normalizer.arrays()
        max_len = max(max(self.hp.length_buckets), 4096)
        res = native.load_mel_batch(paths, max_len, self.hp.mel_dim,
                                    0.0, mean, var, n_threads=n_threads,
                                    fill_tail=False)
        if res is None:
            return [self[i] for i in indices]
        buf, lengths = res
        samples = []
        for row, (i, n) in enumerate(zip(indices, lengths)):
            if n < 0 or n >= max_len:
                samples.append(self[i])
            else:
                samples.append(self.__getitem__(
                    i, _preloaded_mel=buf[row, :n]))
        return samples

    def _fast_mel_length(self, idx: int) -> Optional[int]:
        """Length of utterance ``idx`` from the .npy header only.

        The reference builds lengths.npy by iterating __getitem__
        (datasets_fastspeech2.py:761-774) — loading every mel AND its
        f0/energy/alignment siblings just to read one shape. Here .npy
        headers are parsed without touching the data (None -> fall back
        to the full __getitem__ for .htk/.mel containers)."""
        mel_name = self.rows[idx][0]
        if not mel_name.endswith(".npy"):
            return None
        try:
            n = np.load(mel_name, mmap_mode="r").shape[0]
        except Exception:
            return None
        if self.hp.output_type:
            return n
        if self.is_ar:
            return _round_up(n + 1, self.hp.reduction_rate)  # go-frame
        return n

    def mel_lengths(self, cache_file: Optional[str] = None) -> np.ndarray:
        """Per-utterance mel lengths (built/cached like the reference's
        lengths.npy, datasets_fastspeech2.py:761-774), via header-only
        .npy reads on the cold path."""
        if cache_file and os.path.exists(cache_file):
            lengths = np.load(cache_file)
            if len(lengths) != len(self):
                raise ValueError(
                    f"lengths file {cache_file} has {len(lengths)} entries "
                    f"for a {len(self)}-utterance script")
            return lengths
        def length(i):
            n = self._fast_mel_length(i)
            return n if n is not None else self[i]["mel_length"]

        lengths = np.array([length(i) for i in range(len(self))])
        if cache_file:
            np.save(cache_file, lengths)
        return lengths
