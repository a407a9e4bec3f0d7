"""Checkpoint save/restore/averaging tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, restore_params, restore_variables,
    average_checkpoints, should_save, list_epochs, prune_checkpoints)
from transformer_tts_tpu.train.trainer import init_fastspeech2_state


def small_state(**over):
    hp = HParams(d_model_encoder=16, d_model_decoder=16, n_layer_encoder=1,
                 n_layer_decoder=1, n_head_encoder=2, n_head_decoder=2,
                 vocab_size=12, mel_dim=4, amp=False, batch_size=2, **over)
    return init_fastspeech2_state(hp, jax.random.PRNGKey(0), max_text=8,
                                  max_frames=16)


def conformer_state():
    """Conformer FS2 — the one family whose ConvModule has BatchNorm."""
    return small_state(encoder_type="conformer", decoder_type="conformer")


def test_should_save_matches_reference_policy():
    # last 10 epochs always (train_fastspeech2.py:316)
    assert should_save(195, 200, 50)
    assert should_save(190, 200, 50)
    # window around save_per_epoch multiples (:318)
    assert should_save(50, 200, 50)
    assert should_save(45, 200, 50)
    assert should_save(41, 200, 50)   # 41 % 50 = 41 >= 40
    assert should_save(40, 200, 50)   # 40 % 50 = 40 >= 40
    assert not should_save(39, 200, 50)
    assert not should_save(25, 200, 50)


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    _, state = small_state()
    state = state.replace(step=jnp.asarray(123, jnp.int32))
    save_checkpoint(str(tmp_path), state, epoch=7)
    _, fresh = small_state()
    restored, epoch = restore_checkpoint(str(tmp_path), fresh)
    assert epoch == 7
    assert int(restored.step) == 123
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_survives_donated_buffers(tmp_path):
    """block=False snapshots to host before the buffers are reused."""
    from transformer_tts_tpu.train.checkpoint import wait_for_saves
    _, state = small_state()
    state = state.replace(step=jnp.asarray(5, jnp.int32))
    expect = jax.device_get(state.params)
    save_checkpoint(str(tmp_path), state, epoch=1, block=False)
    # clobber the live state as a donated next-step would
    state = state.replace(params=jax.tree.map(
        lambda x: x * 0 + 99.0 if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state.params))
    jax.block_until_ready(state.params)
    wait_for_saves()
    _, fresh = small_state()
    restored, epoch = restore_checkpoint(str(tmp_path), fresh)
    assert epoch == 1
    for x, y in zip(jax.tree.leaves(expect),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_average_checkpoints(tmp_path):
    _, state = small_state()
    ones = jax.tree.map(jnp.ones_like, state.params)
    threes = jax.tree.map(lambda x: 3.0 * jnp.ones_like(x), state.params)
    save_checkpoint(str(tmp_path), state.replace(params=ones), epoch=1,
                    with_optimizer=False)
    save_checkpoint(str(tmp_path), state.replace(params=threes), epoch=2,
                    with_optimizer=False)
    avg, path = average_checkpoints(str(tmp_path), 1, 2, state.params)
    for leaf in jax.tree.leaves(avg):
        np.testing.assert_allclose(np.asarray(leaf), 2.0)
    # the averaged file is loadable as params-only
    p = restore_params(path, state.params)
    for leaf in jax.tree.leaves(p):
        np.testing.assert_allclose(np.asarray(leaf), 2.0)


def test_restore_variables_carries_batch_stats(tmp_path):
    """Synthesis must see the TRAINED BatchNorm running stats.

    Regression: restore_params + init batch_stats silently mis-normalized
    every conformer BatchNorm at eval (the mean-0/var-1 init stats), which
    broke synthesis from trained conformer checkpoints while teacher-forced
    restore_checkpoint paths stayed correct.
    """
    _, state = conformer_state()
    stats = jax.tree.leaves(state.batch_stats)
    assert stats, "conformer state should have BatchNorm running stats"
    trained = jax.tree.map(lambda x: x + 7.0, state.batch_stats)
    save_checkpoint(str(tmp_path), state.replace(batch_stats=trained),
                    epoch=1, with_optimizer=False)
    _, fresh = conformer_state()
    variables = restore_variables(str(tmp_path), fresh)
    for x, y in zip(jax.tree.leaves(trained),
                    jax.tree.leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_average_checkpoints_carries_batch_stats(tmp_path):
    """Averaged snapshots keep running stats (the reference averages the
    whole state_dict, BatchNorm buffers included)."""
    _, state = conformer_state()
    one = state.replace(
        params=jax.tree.map(jnp.ones_like, state.params),
        batch_stats=jax.tree.map(jnp.ones_like, state.batch_stats))
    three = state.replace(
        params=jax.tree.map(lambda x: 3.0 * jnp.ones_like(x), state.params),
        batch_stats=jax.tree.map(lambda x: 3.0 * jnp.ones_like(x),
                                 state.batch_stats))
    save_checkpoint(str(tmp_path), one, epoch=1, with_optimizer=False)
    save_checkpoint(str(tmp_path), three, epoch=2, with_optimizer=False)
    avg, path = average_checkpoints(str(tmp_path), 1, 2, state.params,
                                    state=state)
    for leaf in jax.tree.leaves(avg):
        np.testing.assert_allclose(np.asarray(leaf), 2.0)
    _, fresh = conformer_state()
    variables = restore_variables(path, fresh)
    for leaf in jax.tree.leaves(variables["batch_stats"]):
        np.testing.assert_allclose(np.asarray(leaf), 2.0)
    for leaf in jax.tree.leaves(variables["params"]):
        np.testing.assert_allclose(np.asarray(leaf), 2.0)


def test_restore_variables_params_only_fallback_warns(tmp_path):
    """Legacy params-only averaged snapshots fall back to init stats
    loudly, not silently."""
    import pytest
    _, state = conformer_state()
    save_checkpoint(str(tmp_path), state, epoch=1, with_optimizer=False)
    _, path = average_checkpoints(str(tmp_path), 1, 1, state.params)
    _, fresh = conformer_state()
    with pytest.warns(UserWarning, match="params-only"):
        variables = restore_variables(path, fresh)
    for x, y in zip(jax.tree.leaves(fresh.batch_stats),
                    jax.tree.leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prune_keeps_reference_retention(tmp_path):
    _, state = small_state()
    for e in [25, 41, 50, 55]:
        save_checkpoint(str(tmp_path), state, epoch=e,
                        with_optimizer=False)
    prune_checkpoints(str(tmp_path), current_epoch=56, max_epoch=200,
                      save_per_epoch=50)
    kept = list_epochs(str(tmp_path))
    assert 25 not in kept       # outside any retention window
    assert {41, 50, 55} <= set(kept)
