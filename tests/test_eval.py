"""mel-L1 / MCD evaluation tests."""

import numpy as np
import pytest


def test_identical_mels_zero():
    from transformer_tts_tpu.eval import mcd, mel_l1
    rs = np.random.RandomState(0)
    mel = rs.randn(50, 20).astype(np.float32)
    assert mel_l1(mel, mel) == 0.0
    assert mcd(mel, mel) == pytest.approx(0.0, abs=1e-6)


def test_mcd_matches_analytic_constant_offset():
    """A constant log-mel offset is pure c0 — excluded, so MCD == 0;
    a known cepstral perturbation gives the closed-form value."""
    from transformer_tts_tpu.eval import mcd, mel_cepstra
    rs = np.random.RandomState(1)
    mel = rs.randn(30, 16).astype(np.float32)
    assert mcd(mel, mel + 1.7) == pytest.approx(0.0, abs=1e-5)

    # perturb exactly one retained cepstral coefficient by delta:
    # MCD = 10/ln10 * sqrt(2) * |delta|
    m = 16
    n = np.arange(m)
    basis1 = np.sqrt(2.0 / m) * np.cos(np.pi * (n + 0.5) * 1 / m)
    delta = 0.3
    mel2 = mel + delta * basis1[None, :] / (basis1 @ basis1)
    c1 = mel_cepstra(mel)
    c2 = mel_cepstra(mel2)
    np.testing.assert_allclose(c2[:, 0] - c1[:, 0], delta, atol=1e-5)
    got = mcd(mel, mel2)
    assert got == pytest.approx(10 / np.log(10) * np.sqrt(2) * delta,
                                rel=1e-4)


def test_dtw_recovers_time_stretch():
    """A frame-duplicated (slowed) copy should score near zero with DTW
    and clearly nonzero without."""
    from transformer_tts_tpu.eval import mcd
    rs = np.random.RandomState(2)
    mel = rs.randn(40, 12).astype(np.float32)
    slowed = np.repeat(mel, 2, axis=0)
    assert mcd(mel, slowed, use_dtw=True) == pytest.approx(0.0, abs=1e-5)
    assert mcd(mel, slowed[:40], use_dtw=False) > 1.0


def test_evaluate_cli(tmp_path, capsys):
    from transformer_tts_tpu.cli import evaluate
    rs = np.random.RandomState(3)
    lines = []
    for i in range(3):
        ref = rs.randn(20 + i, 8).astype(np.float32)
        np.save(tmp_path / f"ref{i}.npy", ref)
        np.save(tmp_path / f"{i}.npy",
                ref + rs.randn(*ref.shape).astype(np.float32) * 0.01)
        lines.append(f"{tmp_path}/ref{i}.npy|1 2 3")
    (tmp_path / "test.txt").write_text("\n".join(lines) + "\n")
    rc = evaluate.main(["--ref_script", str(tmp_path / "test.txt"),
                        "--gen_dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean over 3" in out and "mcd=" in out


def test_mcd_empty_mel_raises():
    import numpy as np
    import pytest
    from transformer_tts_tpu.eval import mcd
    with pytest.raises(ValueError, match="empty"):
        mcd(np.zeros((0, 8), np.float32), np.zeros((4, 8), np.float32))


def test_dtw_path_returns_int_indices():
    import numpy as np
    from transformer_tts_tpu.eval import dtw_path
    p1, p2 = dtw_path(np.random.rand(3, 5))
    assert p1.dtype.kind == "i" and p2.dtype.kind == "i"
