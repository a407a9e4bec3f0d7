"""Duration extraction from AR cross-attention."""

import os

import numpy as np
import pytest


def test_durations_from_attention_unit():
    from transformer_tts_tpu.cli.extract_durations import (
        durations_from_attention)
    # a perfectly diagonal head among noise heads: phone i gets 2 queries
    layers, heads, t_q, l = 2, 2, 8, 4
    rs = np.random.RandomState(0)
    attn = rs.rand(layers, heads, t_q, l).astype(np.float32) * 0.1
    for q in range(t_q):
        attn[1, 0, q, q // 2] = 1.0           # diagonal at 2 queries/phone
    d = durations_from_attention(attn, n_phones=l, n_frames=16, r=2)
    np.testing.assert_array_equal(d, [4, 4, 4, 4])
    assert d.sum() == 16


def test_durations_sum_invariant_under_rounding():
    from transformer_tts_tpu.cli.extract_durations import (
        durations_from_attention)
    rs = np.random.RandomState(1)
    for n_frames in (13, 14, 15, 16):
        attn = rs.rand(1, 1, 8, 4).astype(np.float32)
        d = durations_from_attention(attn, n_phones=4, n_frames=n_frames,
                                     r=2)
        assert d.sum() == n_frames
        assert (d >= 0).all()


def test_mas_recovers_exact_alignment():
    from transformer_tts_tpu.cli.extract_durations import mas_durations
    # ground-truth monotonic alignment with varying durations
    rs = np.random.RandomState(2)
    true_d = np.array([2, 3, 1, 2])               # in decoder steps
    t_q, l = int(true_d.sum()), 4
    attn = rs.rand(2, 2, t_q, l).astype(np.float32) * 0.05
    q = 0
    for phone, d in enumerate(true_d):
        for _ in range(d):
            attn[0, 1, q, phone] = 0.9
            q += 1
    d, head, score = mas_durations(attn, n_phones=l, n_frames=2 * t_q,
                                   r=2)
    assert head == (0, 1)
    np.testing.assert_array_equal(d, true_d * 2)
    assert np.isfinite(score)


def test_mas_beats_focused_degenerate_head():
    """A sharply-focused but degenerate head (all mass on one phone —
    the round-3 failure mode) must lose to a broader aligned head under
    MAS selection; raw focus-rate selection would pick the degenerate
    one and extract [0,..,T,..,0]."""
    from transformer_tts_tpu.cli.extract_durations import (
        attention_quality, durations_from_attention, mas_durations)
    t_q, l = 8, 4
    attn = np.full((1, 2, t_q, l), 0.02, np.float32)
    attn[0, 0, :, 2] = 1.0                # degenerate: focus 1.0
    for q in range(t_q):                  # aligned but soft: focus 0.6
        attn[0, 1, q, q // 2] = 0.6
    d_mas, head, _ = mas_durations(attn, n_phones=l, n_frames=16, r=2)
    assert head == (0, 1)
    np.testing.assert_array_equal(d_mas, [4, 4, 4, 4])
    # the focus rule picks the degenerate head -> one phone eats all
    d_arg = durations_from_attention(attn, n_phones=l, n_frames=16, r=2)
    assert d_arg[2] == 16 and d_arg.sum() == 16
    assert attention_quality(attn, l, 16, 2)["coverage"] == 0.25


def test_mas_durations_sum_invariant():
    from transformer_tts_tpu.cli.extract_durations import mas_durations
    rs = np.random.RandomState(3)
    for n_frames in (13, 14, 15, 16):
        attn = rs.rand(1, 1, 8, 4).astype(np.float32)
        d, _, _ = mas_durations(attn, n_phones=4, n_frames=n_frames, r=2)
        assert d.sum() == n_frames
        assert (d >= 0).all()


def test_mas_falls_back_when_too_short():
    """More phones than decoder steps: MAS is infeasible; falls back to
    the argmax recipe (still sums to n_frames)."""
    from transformer_tts_tpu.cli.extract_durations import mas_durations
    rs = np.random.RandomState(4)
    attn = rs.rand(1, 1, 3, 6).astype(np.float32)
    d, _, score = mas_durations(attn, n_phones=6, n_frames=6, r=2)
    assert d.sum() == 6 and score == float("-inf")


@pytest.mark.slow
def test_ar_teacher_to_fastspeech2_pipeline(tmp_path):
    """Train AR -> extract durations -> FS2 trains on them."""
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
    lines = []
    for i in range(4):
        t_text = rs.randint(4, 8)
        t_mel = t_text * 3 + (i % 2)          # odd lengths exercise r-rounding
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(lines[:2]) + "\n")
    # note: NO *_alignment.npy files exist yet

    ar_dir = str(tmp_path / "ar")
    hp_ar, _ = write_hp(tmp_path, tmp_path, model="Transformer",
                        max_epoch=1, reduction_rate=2,
                        ff_conv_kernel_size_decoder=1, save_dir=ar_dir)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_ar])

    from transformer_tts_tpu.cli import extract_durations
    extract_durations.main(["--load_name", ar_dir])

    for i, line in enumerate(lines):
        mel_path = line.split("|")[0]
        d = np.load(mel_path.replace(".npy", "_alignment.npy"))
        mel = np.load(mel_path)
        assert d.dtype == np.int32
        assert d.sum() == mel.shape[0]        # exact, incl. odd lengths
        assert (d >= 0).all()

    # the extracted durations feed FastSpeech2 training directly
    fs_dir = str(tmp_path / "fs2")
    hp_fs, _ = write_hp(tmp_path, tmp_path, max_epoch=1, save_dir=fs_dir)
    cli_train.main(["--hp_file", hp_fs])
    assert os.path.isdir(os.path.join(fs_dir, "epoch_1"))
