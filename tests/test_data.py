"""Data layer tests with a tiny synthetic corpus."""

import os

import numpy as np
import pytest

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.data import (
    TTSDataset, DataLoader, LengthsBatchSampler, NumBatchSampler,
    shard_batches, collate, pick_bucket)
from transformer_tts_tpu.data.readers import load_htk, load_mel


MEL_DIM = 8


@pytest.fixture
def corpus(tmp_path):
    """12 utterances with mel/alignment/f0/energy sidecars + script."""
    rs = np.random.RandomState(0)
    lines = []
    for i in range(12):
        t_text = rs.randint(4, 10)
        frames_per = rs.randint(2, 5)
        t_mel = t_text * frames_per
        mel = rs.randn(t_mel, MEL_DIM).astype(np.float32)
        base = tmp_path / f"utt{i}.npy"
        np.save(base, mel)
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), frames_per, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 30, t_text))
        lines.append(f"{base}|{ids}")
    script = tmp_path / "train.txt"
    script.write_text("\n".join(lines) + "\n")
    return tmp_path, str(script)


def make_hp(**kw):
    return HParams(mel_dim=MEL_DIM, vocab_size=30, batch_size=4,
                   text_buckets=(8, 16), length_buckets=(32, 64, 128), **kw)


def test_dataset_getitem(corpus):
    _, script = corpus
    ds = TTSDataset(script, make_hp())
    s = ds[0]
    assert s["mel"].shape[1] == MEL_DIM
    assert s["alignment"].sum() == s["mel_length"]
    assert len(s["f0"]) == s["mel_length"]
    assert s["text_length"] == len(s["text"])


def test_collate_static_buckets_and_pad_values(corpus):
    _, script = corpus
    hp = make_hp()
    ds = TTSDataset(script, hp)
    batch = collate([ds[i] for i in range(3)], hp)
    assert batch["text"].shape[1] in hp.text_buckets
    assert batch["mel"].shape[1] in hp.length_buckets
    assert batch["mel"].shape[0] == 4  # batch bucket of 3 -> 4
    # pad values: mel -0.5 is only for normalized corpora; raw here -> -5.0
    i, n = 0, int(batch["mel_length"][0])
    assert np.all(batch["mel"][i, n:] == -5.0)
    assert np.all(batch["stop_token"][i, n:] == 1.0)
    assert np.all(batch["stop_token"][i, :n] == 0.0)
    assert np.all(batch["pos_mel"][i, n:] == 0)
    # padded rows (index 3) fully padded
    assert np.all(batch["pos_text"][3] == 0)
    assert batch["n_real"] == 3


def test_collate_shapes_stable_across_batches(corpus):
    """Bucketing must produce few distinct shapes -> few XLA compiles."""
    _, script = corpus
    hp = make_hp()
    ds = TTSDataset(script, hp)
    loader = DataLoader(ds, hp, num_workers=2)
    shapes = {tuple(b["mel"].shape) for b in loader}
    assert len(shapes) <= 3


def test_lengths_batch_sampler_matches_reference_packing():
    """Greedy max_len*(count+1) <= budget (datasets_fastspeech2.py:784-801)."""
    lengths = np.array([10, 12, 8, 30, 5, 5, 5, 40])
    sampler = LengthsBatchSampler(lengths, 30, shuffle=False,
                                  sort_by_length=False)
    batches = sampler.all_indices
    for b in batches:
        assert max(lengths[b]) * len(b) <= 30 or len(b) == 1
    flat = [i for b in batches for i in b]
    assert flat == sorted(flat)  # consecutive packing


def test_num_batch_sampler_remainder():
    s = NumBatchSampler(10, 4, shuffle=False)
    sizes = sorted(len(b) for b in s.all_indices)
    assert sizes == [2, 4, 4]


def test_shard_batches_disjoint_and_equal():
    batches = [[i] for i in range(10)]
    shards = [shard_batches(batches, k, 4) for k in range(4)]
    lens = {len(s) for s in shards}
    assert len(lens) == 1  # equal step counts
    seen = [b[0] for s in shards for b in s]
    assert set(seen) == set(range(10))


def test_pick_bucket():
    assert pick_bucket(100, (128, 256)) == 128
    assert pick_bucket(129, (128, 256)) == 256
    assert pick_bucket(300, (128, 256)) == 384  # round up past largest
    assert pick_bucket(10, (15, 30), multiple=2) == 30  # needs multiple


def test_htk_reader_roundtrip(tmp_path):
    """Write a little-endian-swapped HTK file and read it back."""
    import struct
    frames = np.arange(24, dtype=">f4").reshape(4, 6)
    path = tmp_path / "x.htk"
    with open(path, "wb") as fh:
        fh.write(struct.pack(">IIHH", 4, 100000, 6 * 4, 9))
        fh.write(frames.tobytes())
    mel = load_htk(str(path))
    np.testing.assert_allclose(mel, np.arange(24).reshape(4, 6))


def test_ar_dataset_prepends_go_frame(corpus):
    _, script = corpus
    hp = make_hp(model="Transformer", reduction_rate=2)
    ds = TTSDataset(script, hp)
    s = ds[0]
    assert np.all(s["mel"][0] == 0.0)
    assert s["mel_length"] % 2 == 0


def test_mean_var_normalization(corpus, tmp_path):
    root, script = corpus
    mean = np.zeros((1, MEL_DIM), np.float32) + 2.0
    var = np.ones((1, MEL_DIM), np.float32) * 4.0
    np.save(tmp_path / "mean.npy", mean)
    np.save(tmp_path / "var.npy", var)
    hp = make_hp(mean_file=str(tmp_path / "mean.npy"),
                 var_file=str(tmp_path / "var.npy"))
    ds = TTSDataset(script, hp)
    raw = load_mel(ds.rows[0][0], MEL_DIM)
    np.testing.assert_allclose(ds[0]["mel"], (raw - 2.0) / 2.0, rtol=1e-5)


def test_native_loader_matches_numpy(corpus, tmp_path):
    """Native fused load+normalize must equal the numpy path exactly."""
    from transformer_tts_tpu.data import native
    if not native.available():
        pytest.skip("native library unavailable")
    root, script = corpus
    mean = np.full((1, MEL_DIM), 1.5, np.float32)
    var = np.full((1, MEL_DIM), 2.25, np.float32)
    np.save(tmp_path / "mean.npy", mean)
    np.save(tmp_path / "var.npy", var)
    hp = make_hp(mean_file=str(tmp_path / "mean.npy"),
                 var_file=str(tmp_path / "var.npy"))
    ds = TTSDataset(script, hp)
    for i in range(3):
        path = ds.rows[i][0]
        nat = native.load_mel_normalized(path, MEL_DIM, mean, var)
        ref = ds.normalizer(load_mel(path, MEL_DIM))
        np.testing.assert_allclose(nat, ref, rtol=1e-6, atol=1e-7)


def test_native_pad_batch_matches_numpy():
    from transformer_tts_tpu.data import native
    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(0)
    mels = [rs.randn(7, 4).astype(np.float32),
            rs.randn(3, 4).astype(np.float32)]
    out = native.pad_mel_batch(mels, 8, -0.5)
    ref = np.full((2, 8, 4), -0.5, np.float32)
    ref[0, :7] = mels[0]
    ref[1, :3] = mels[1]
    np.testing.assert_array_equal(out, ref)


def test_lengths_batch_sampler_sum_budget():
    """Sum-of-lengths packing (datasets_transformer.py:431-490 variant)."""
    lengths = np.array([10, 12, 8, 30, 5, 5, 5, 40])
    s = LengthsBatchSampler(lengths, 30, shuffle=False, budget="sum",
                            sort_by_length=False)
    for b in s.all_indices:
        assert sum(lengths[b]) <= 30 or len(b) == 1
    flat = [i for b in s.all_indices for i in b]
    assert flat == sorted(flat)


def test_mel_lengths_fast_path_matches_getitem(corpus):
    """Header-only .npy length scan must equal the full __getitem__
    lengths for NAR, AR (go-frame + reduction-rate rounding), and
    discrete token corpora."""
    tmp_path, script = corpus
    for kw in (dict(),                                     # NAR float
               dict(model="Transformer", reduction_rate=2)):  # AR
        hp = make_hp(**kw)
        ds = TTSDataset(script, hp)
        fast = ds.mel_lengths()
        slow = np.array([ds[i]["mel_length"] for i in range(len(ds))])
        np.testing.assert_array_equal(fast, slow)
        assert all(ds._fast_mel_length(i) is not None
                   for i in range(len(ds)))   # fast path actually used


def test_native_batch_loader_matches_per_item(corpus, tmp_path):
    """load_batch_samples (one threaded C++ call) == per-item path."""
    from transformer_tts_tpu.data import native
    if not native.available():
        pytest.skip("native library unavailable")
    root, script = corpus
    mean = np.full((1, MEL_DIM), 1.5, np.float32)
    var = np.full((1, MEL_DIM), 2.25, np.float32)
    np.save(tmp_path / "mean.npy", mean)
    np.save(tmp_path / "var.npy", var)
    hp = make_hp(mean_file=str(tmp_path / "mean.npy"),
                 var_file=str(tmp_path / "var.npy"))
    ds = TTSDataset(script, hp)
    idxs = [3, 0, 7, 5]
    fast = ds.load_batch_samples(idxs, n_threads=3)
    slow = [ds[i] for i in idxs]
    for f, s in zip(fast, slow):
        np.testing.assert_allclose(f["mel"], s["mel"], rtol=1e-6,
                                   atol=1e-7)
        assert f["mel_length"] == s["mel_length"]
        np.testing.assert_array_equal(f["alignment"], s["alignment"])
        np.testing.assert_array_equal(f["text"], s["text"])
    # the DataLoader path produces identical collated batches to a
    # dataset whose fast path is forced off
    class SlowDS(TTSDataset):
        def load_batch_samples(self, indices, n_threads=8):
            return [self[i] for i in indices]

    batches_fast = list(DataLoader(ds, hp, num_workers=2))
    batches_slow = list(DataLoader(SlowDS(script, hp), hp,
                                   num_workers=2))
    assert len(batches_fast) == len(batches_slow) > 0
    for bf, bs in zip(batches_fast, batches_slow):
        np.testing.assert_allclose(bf["mel"], bs["mel"], rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_array_equal(bf["pos_mel"], bs["pos_mel"])


def test_lengths_sampler_sort_by_length():
    lengths = np.array([100, 10, 90, 20, 80, 30, 70, 40])
    s = LengthsBatchSampler(lengths, 200, shuffle=False,
                            sort_by_length=True)
    batches = list(iter(s))
    # every utterance appears exactly once
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(8))
    # batches are length-homogeneous: each batch's lengths are a
    # contiguous run of the sorted lengths
    seen = [lengths[i] for b in batches for i in b]
    assert seen == sorted(seen) or seen == sorted(seen, reverse=True)
    # corpus-order packing (reference literal) still available
    s2 = LengthsBatchSampler(lengths, 200, shuffle=False,
                             sort_by_length=False)
    flat2 = [i for b in iter(s2) for i in b]
    assert flat2 == sorted(flat2)
