"""Mel-mel and integrate (text-mel-mel) trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.train.trainer import (
    build_fastspeech2, init_fastspeech2_state)
from transformer_tts_tpu.train.post_trainers import (
    init_post_state, make_meltomel_train_step, make_integrate_train_step)


def base_hp(**kw):
    return HParams(
        d_model_encoder=32, d_model_decoder=32, n_layer_encoder=1,
        n_layer_decoder=1, n_head_encoder=2, n_head_decoder=2,
        n_layer_post_model=1, vocab_size=20, mel_dim=8, mel_dim_post=8,
        amp=False, batch_size=2, warmup_step=10, **kw)


def make_batch(seed=0, b=2, l=8, t=24, mel_dim=8, vocab=20):
    rs = np.random.RandomState(seed)
    return {
        "text": jnp.asarray(rs.randint(1, vocab, (b, l)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, l + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, t, mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, t + 1)[None], (b, 1)),
        "alignment": jnp.full((b, l), t // l, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, t).astype(np.float32) * 200),
        "energy": jnp.asarray(rs.rand(b, t).astype(np.float32) * 50),
    }


@pytest.mark.parametrize("version,residual", [(1, False), (2, False),
                                              (3, True), (4, False),
                                              (5, True), (6, True)])
@pytest.mark.slow
def test_meltomel_versions(version, residual):
    hp = base_hp(architecture="mel-mel", version=version,
                 phone_embed=version in (2, 3, 4, 6, 7))
    rng = jax.random.PRNGKey(0)
    teacher, t_state = init_fastspeech2_state(hp, rng)
    teacher_variables = {"params": t_state.params,
                         "batch_stats": t_state.batch_stats,
                         "vq_stats": t_state.vq_stats}
    student, s_state = init_post_state(hp, rng, teacher)
    step_fn = make_meltomel_train_step(teacher, teacher_variables, student,
                                       hp, donate=False)
    batch = make_batch()
    s_state, logs = step_fn(s_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss_total"]))
    assert not bool(logs["skipped_nan"])


def test_meltomel_teacher_frozen():
    """Student step must not touch the teacher params (stop_gradient)."""
    hp = base_hp(architecture="mel-mel", version=2, phone_embed=True)
    rng = jax.random.PRNGKey(0)
    teacher, t_state = init_fastspeech2_state(hp, rng)
    teacher_variables = {"params": t_state.params,
                         "batch_stats": t_state.batch_stats,
                         "vq_stats": t_state.vq_stats}
    student, s_state = init_post_state(hp, rng, teacher)
    step_fn = make_meltomel_train_step(teacher, teacher_variables, student,
                                       hp, donate=False)
    before = jax.tree.map(np.asarray, teacher_variables["params"])
    s0 = jax.tree.leaves(s_state.params)[0].copy()
    s_state, _ = step_fn(s_state, make_batch(), jax.random.PRNGKey(1))
    after = jax.tree.map(np.asarray, teacher_variables["params"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert not np.allclose(s0, jax.tree.leaves(s_state.params)[0])


@pytest.mark.slow
@pytest.mark.parametrize("version", [3, 8, 9, 10])
def test_integrate_train_versions(version):
    hp = base_hp(architecture="text-mel-mel", version=version,
                 postnet_pred=False, phone_embed=True,
                 semantic_mask=True, semantic_mask_phone=False,
                 use_cosine_emb_loss=(version == 3))
    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng, enable_post_model=True)
    step_fn = make_integrate_train_step(model, hp, donate=False)
    state, logs = step_fn(state, make_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss_total"]))
    assert "loss_post_pro" in logs
    if version in (8, 9, 10):
        assert "replace_loss" in logs
    if version == 3:
        assert "loss_cosine_emb" in logs
