"""Unit tests for pure ops: masks, length regulator, PE tables, schedules."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_tts_tpu.ops.masks import (
    pad_mask, no_peek_mask, band_mask, create_masks, mask_from_lengths)
from transformer_tts_tpu.ops.length_regulator import (
    length_regulate, durations_from_log)
from transformer_tts_tpu.ops.positional import (
    sinusoid_table, relative_sinusoid_table)
from transformer_tts_tpu.train.schedule import noam_schedule
from transformer_tts_tpu.train import losses as L


def test_pad_mask():
    pos = jnp.array([[1, 2, 3, 0, 0], [1, 2, 0, 0, 0]])
    m = pad_mask(pos)
    assert m.shape == (2, 1, 5)
    np.testing.assert_array_equal(
        np.asarray(m[:, 0]), [[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]])


def test_no_peek_mask_matches_reference():
    # reference npeak_mask(4) (train_fastspeech2.py:42-52)
    expect = np.array([[1, 0, 0, 0], [1, 1, 0, 0],
                       [1, 1, 1, 0], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(np.asarray(no_peek_mask(4)[0]), expect)


def test_band_mask_matches_reference_eye_sum():
    # reference builds sum of np.eye(size, k) for k in [-3..3]
    size, context_len = 9, 7
    ref = np.zeros((size, size))
    for k in range(-(context_len - 1) // 2, (context_len - 1) // 2 + 1):
        ref += np.eye(size, k=k)
    np.testing.assert_array_equal(
        np.asarray(band_mask(size, context_len)[0]), ref.astype(bool))


def test_create_masks_ar_vs_nar():
    pos_text = jnp.array([[1, 2, 0]])
    pos_mel = jnp.array([[1, 2, 3, 0]])
    src, trg = create_masks(pos_text, pos_mel, model="fastspeech2")
    assert trg.shape == (1, 1, 4)
    src, trg = create_masks(pos_text, pos_mel, model="transformer")
    assert trg.shape == (1, 4, 4)
    # causal: position 0 can't see position 1
    assert not bool(trg[0, 0, 1])
    # padding col 3 masked everywhere
    assert not bool(trg[0, 3, 3])


def test_mask_from_lengths_strict():
    m = mask_from_lengths(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


def test_length_regulate_matches_loop_expansion():
    """The vectorized gather must equal the reference's expand+cat loop."""
    rng = np.random.RandomState(0)
    B, Lp, D, T = 3, 5, 4, 16
    x = rng.randn(B, Lp, D).astype(np.float32)
    durations = np.array([[2, 0, 3, 1, 0],
                          [1, 1, 1, 1, 1],
                          [0, 4, 0, 0, 2]], np.int32)
    out, mel_len, mel_pos = length_regulate(
        jnp.asarray(x), jnp.asarray(durations), T)

    for b in range(B):
        # reference expand loop (Models/varianceadaptor.py:169-177)
        rows = [np.repeat(x[b, i:i + 1], durations[b, i], axis=0)
                for i in range(Lp)]
        ref = np.concatenate(rows, axis=0)
        n = ref.shape[0]
        assert int(mel_len[b]) == n
        np.testing.assert_allclose(np.asarray(out[b, :n]), ref, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out[b, n:]), 0.0)
        np.testing.assert_array_equal(
            np.asarray(mel_pos[b, :n]), np.arange(1, n + 1))
        np.testing.assert_array_equal(np.asarray(mel_pos[b, n:]), 0)


def test_length_regulate_clips_to_max_frames():
    x = jnp.ones((1, 2, 3))
    out, mel_len, _ = length_regulate(x, jnp.array([[5, 5]]), 6)
    assert int(mel_len[0]) == 6
    assert out.shape == (1, 6, 3)


def test_durations_from_log():
    # round(exp(logd) - 1) clamped at 0 (varianceadaptor.py:75)
    logd = jnp.log(jnp.array([[1.0, 3.0, 0.2]]))
    d = durations_from_log(logd, log_offset=1.0)
    np.testing.assert_array_equal(np.asarray(d), [[0, 2, 0]])
    d = durations_from_log(logd, log_offset=1.0, scale=1.2)
    np.testing.assert_array_equal(np.asarray(d), [[0, 2, 0]])


def test_sinusoid_table_matches_reference_loop():
    """Reproduce Models/modules.py:98-105 double loop exactly."""
    d_model, max_len = 8, 12
    pe = np.zeros((max_len, d_model))
    for pos in range(max_len):
        for i in range(0, d_model, 2):
            pe[pos, i] = np.sin(pos / (10000 ** ((2 * i) / d_model)))
            pe[pos, i + 1] = np.cos(
                pos / (10000 ** ((2 * (i + 1)) / d_model)))
    ours = np.asarray(sinusoid_table(max_len, d_model))
    np.testing.assert_allclose(ours, pe, rtol=1e-5, atol=1e-6)


def test_relative_sinusoid_table_matches_reference():
    """Reproduce Models/modules.py:292-298."""
    d_model, max_len = 6, 10
    pe = np.zeros((max_len, d_model))
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    ours = np.asarray(relative_sinusoid_table(max_len, d_model))
    np.testing.assert_allclose(ours, pe, rtol=1e-5, atol=1e-6)


def test_rebuilt_optimizer_is_same_pytree_type():
    """build_optimizer equality-by-recipe (train/schedule.py
    RecipeTransform): a TrainState whose optimizer was REBUILT from the
    same hparams must be the same pytree type as the original, or an
    AOT-compiled train step rejects a restored-into-fresh state
    ('input pytree does not match' — the 2-process checkpoint-resume
    failure mode) and plain jit silently retraces."""
    import jax
    from transformer_tts_tpu.train.schedule import build_optimizer
    a = build_optimizer("noam", 32, warmup_step=10)
    b = build_optimizer("noam", 32, warmup_step=10)
    c = build_optimizer("noam", 32, warmup_step=11)
    assert a == b and hash(a) == hash(b)
    assert a != c
    # and at the level that actually bit: two independently-built
    # TrainStates (fresh optax closures each) must be the SAME pytree
    # type, since tx is static metadata on the state
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state
    hp = HParams(d_model_encoder=16, d_model_decoder=16,
                 n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
                 n_head_decoder=2, vocab_size=10, mel_dim=4, amp=False)
    _, s1 = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    _, s2 = init_fastspeech2_state(hp, jax.random.PRNGKey(123))
    assert (jax.tree_util.tree_structure(s1)
            == jax.tree_util.tree_structure(s2))


def test_noam_schedule_matches_reference_formula():
    """get_learning_rate (utils/utils.py:204-215), step starting at 1."""
    d_model, wf, ws = 384, 1.0, 4000
    sched = noam_schedule(d_model, wf, ws)
    for step1 in [1, 10, 4000, 100000]:
        ref = wf * min(step1 ** -0.5, step1 * ws ** -1.5) * d_model ** -0.5
        got = float(sched(step1 - 1))  # optax step counts from 0
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_stop_token_loss_matches_bce_pos_weight():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 7).astype(np.float32)
    target = (rng.rand(4, 7) > 0.5).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(target),
        pos_weight=torch.tensor(5.0)).item()
    got = float(L.stop_token_loss(jnp.asarray(logits), jnp.asarray(target),
                                  pos_weight=5.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ssim_close_to_torchmetrics_behavior():
    # identical images -> ssim == 1
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32))
    assert abs(float(L.ssim(x, x)) - 1.0) < 1e-5
    # noisy pair -> less than 1
    y = x + 0.5 * jnp.asarray(np.random.RandomState(1).randn(2, 32, 32))
    assert float(L.ssim(x, y)) < 0.9


def test_mse_loss_arelbo_matches_reference():
    # 0.5 * numel_per_sample * log(mse) (train_fastspeech2.py:85-88)
    rng = np.random.RandomState(2)
    a = rng.randn(2, 5, 3).astype(np.float32)
    b = rng.randn(2, 5, 3).astype(np.float32)
    ref = 0.5 * 15 * np.log(np.mean((a - b) ** 2))
    np.testing.assert_allclose(
        float(L.mse_loss_arelbo(jnp.asarray(a), jnp.asarray(b))), ref,
        rtol=1e-5)


def test_softmax_output_loss_matches_torch_cross_entropy():
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(4)
    B, T, C = 2, 6, 5
    pred = rs.randn(B, T, 2 * C).astype(np.float32)
    targets = rs.randint(0, C, (B, T, 2))
    targets[0, -1] = 320   # padding
    loss, accs = L.softmax_output_loss(
        jnp.asarray(pred), jnp.asarray(targets), C)
    ref1 = F.cross_entropy(torch.tensor(pred[:, :, :C]).permute(0, 2, 1),
                           torch.tensor(targets[:, :, 0]),
                           ignore_index=320)
    ref2 = F.cross_entropy(torch.tensor(pred[:, :, C:]).permute(0, 2, 1),
                           torch.tensor(targets[:, :, 1]),
                           ignore_index=320)
    np.testing.assert_allclose(float(loss), float(ref1 + ref2), rtol=1e-5)
    assert 0.0 <= float(accs["accuracy_1"]) <= 1.0


def test_channel_wise_l1():
    rs = np.random.RandomState(5)
    a = rs.randn(2, 4, 30).astype(np.float32)
    b = rs.randn(2, 4, 30).astype(np.float32)
    got = float(L.channel_wise_l1(jnp.asarray(a), jnp.asarray(b),
                                  (2.0, 0.5), split=20))
    ref = (2.0 * np.abs(a[:, :, :20] - b[:, :, :20]).mean()
           + 0.5 * np.abs(a[:, :, 20:] - b[:, :, 20:]).mean())
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_epoch_decay_factor():
    from transformer_tts_tpu.train.schedule import epoch_decay_factor
    assert epoch_decay_factor(5, 10) == 1.0
    np.testing.assert_allclose(epoch_decay_factor(12, 10), 0.8 ** 2)
    np.testing.assert_allclose(
        epoch_decay_factor(25, 3, reset_optimizer_epoch=10), 0.8 ** 2)


def test_apply_reference_init():
    from transformer_tts_tpu.train.schedule import apply_reference_init
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3,), name="conv")(x)
            return nn.Dense(4, name="dense")(x)

    m = M()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 2)))["params"]
    new = apply_reference_init(params, jax.random.PRNGKey(1))
    # conv kernel re-initialized (kaiming), dense kernel untouched
    assert not np.allclose(np.asarray(params["conv"]["kernel"]),
                           np.asarray(new["conv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(params["dense"]["kernel"]),
                                  np.asarray(new["dense"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(new["conv"]["bias"]), 0.0)
    # kaiming std ~ sqrt(2/fan_in), fan_in = 3*2 = 6
    std = np.asarray(new["conv"]["kernel"]).std()
    assert 0.2 < std < 1.2


def test_mxu_conv1d_matches_nn_conv():
    """MXUConv1D (im2col-to-gemm) is a drop-in for nn.Conv: identical
    param tree and numerics for SAME and explicit causal padding
    (ops/conv1d.py; kept as a measured building block — see
    docs/PERF_NOTES.md round-5 in-context A/B)."""
    import flax.linen as nn
    from transformer_tts_tpu.ops.conv1d import MXUConv1D

    rs = np.random.RandomState(0)
    for pad, k in (("SAME", 3), ("SAME", 5), (((4, 0),), 5)):
        x = jnp.asarray(rs.randn(2, 17, 12).astype(np.float32))
        ref = nn.Conv(8, (k,), padding=pad)
        vs = ref.init(jax.random.PRNGKey(0), x)
        mine = MXUConv1D(features=8, kernel_size=k, padding=pad)
        y_ref = ref.apply(vs, x)
        y = mine.apply(vs, x)          # same variables verbatim
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-6)
        # grads flow through the same param names
        g = jax.grad(lambda v: jnp.sum(mine.apply(v, x) ** 2))(vs)
        assert set(g["params"]) == set(vs["params"])
