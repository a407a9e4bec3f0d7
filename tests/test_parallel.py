"""Data-parallel pjit tests on an 8-fake-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch)
from transformer_tts_tpu.train.trainer import (
    init_fastspeech2_state, make_fastspeech2_train_step)


def tiny_hp(**kw):
    return HParams(
        d_model_encoder=32, d_model_decoder=32, n_layer_encoder=1,
        n_layer_decoder=1, n_head_encoder=2, n_head_decoder=2,
        vocab_size=20, mel_dim=8, amp=False, optimizer="Noam",
        warmup_step=100, batch_size=8, **kw)


def make_batch(seed, b=8, l=8, t=24, mel_dim=8, vocab=20):
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


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """The pjit step on a 8-way data mesh must equal the unsharded step."""
    hp = tiny_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    batch = make_batch(0)
    rng = jax.random.PRNGKey(1)

    # single device
    state1, logs1 = step_fn(state, batch, rng)

    # sharded: params replicated, batch split over data axis
    mesh = make_mesh()
    rep = replicated(mesh)
    state_r = jax.device_put(state, rep)
    batch_s = shard_batch(batch, mesh)
    state2, logs2 = step_fn(state_r, batch_s, rng)

    np.testing.assert_allclose(
        float(logs1["loss_total"]), float(logs2["loss_total"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(logs1["grad_norm"]), float(logs2["grad_norm"]), rtol=1e-4)
    # Per-parameter comparison after an Adam step is not meaningful (the
    # first-step update is ~sign(g), amplifying reduction-order noise);
    # run a second step on each and require the losses to keep agreeing.
    state1b, logs1b = step_fn(state1, batch, rng)
    state2b, logs2b = step_fn(state2, batch, rng)
    np.testing.assert_allclose(
        float(logs1b["loss_total"]), float(logs2b["loss_total"]), rtol=1e-3)


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((8, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


@pytest.mark.slow
def test_tp_sharded_step_matches_replicated():
    """2-way TP x 4-way DP must equal the unsharded step numerically."""
    from transformer_tts_tpu.parallel.tp import shard_state_tp
    hp = tiny_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    batch = make_batch(0)
    rng = jax.random.PRNGKey(3)
    _, logs_ref = step_fn(state, batch, rng)

    mesh = make_mesh(data=4, model=2)
    state_tp = shard_state_tp(state, mesh)
    batch_s = shard_batch(batch, mesh)
    _, logs_tp = step_fn(state_tp, batch_s, rng)
    np.testing.assert_allclose(float(logs_ref["loss_total"]),
                               float(logs_tp["loss_total"]), rtol=1e-5)
    np.testing.assert_allclose(float(logs_ref["grad_norm"]),
                               float(logs_tp["grad_norm"]), rtol=1e-3)


def test_tp_params_actually_sharded():
    from transformer_tts_tpu.parallel.tp import shard_state_tp
    hp = tiny_hp()
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    mesh = make_mesh(data=4, model=2)
    state_tp = shard_state_tp(state, mesh)
    # at least one kernel is split over the model axis
    n_sharded = 0
    for leaf in jax.tree.leaves(state_tp.params):
        if hasattr(leaf, "sharding"):
            spec = getattr(leaf.sharding, "spec", None)
            if spec and "model" in [s for s in spec if s]:
                n_sharded += 1
    assert n_sharded > 0


def test_sequence_parallel_attention_matches_single_device():
    """SP attention (q sharded over the axis, K/V all-gathered) must
    equal the unsharded oracle — values and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.parallel.mesh import make_mesh
    from transformer_tts_tpu.parallel.sp import sequence_parallel_attention
    from transformer_tts_tpu.ops.flash_attention import reference_attention

    mesh = make_mesh(data=4, model=2)       # seq over the 2-way axis
    rs = np.random.RandomState(0)
    b, h, t, d = 2, 2, 64, 16
    q = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    k_len = jnp.array([64, 40], jnp.int32)

    def sp(q, k, v):
        return sequence_parallel_attention(q, k, v, k_len, mesh,
                                           axis="model", interpret=True)

    out = sp(q, k, v)
    ref = reference_attention(q, k, v, k_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g_sp = jax.grad(lambda *a: jnp.sum(sp(*a) ** 2), argnums=(0, 1, 2))(
        q, k, v)
    g_ref = jax.grad(
        lambda *a: jnp.sum(reference_attention(*a, k_len) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_conformer_sharded_step_matches_single_device():
    """Relative-attention (conformer) stacks shard over the data mesh
    identically to a single device — the rel-PE table broadcast and the
    batched rel_shift must not couple across shards."""
    hp = tiny_hp(encoder_type="conformer", decoder_type="conformer",
                 dropout=0.0, dropout_postnet=0.0,
                 dropout_variance_adaptor=0.0)
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    batch = make_batch(3)
    rng = jax.random.PRNGKey(1)

    state1, logs1 = step_fn(state, batch, rng)

    mesh = make_mesh()
    state_r = jax.device_put(state, replicated(mesh))
    batch_s = shard_batch(batch, mesh)
    state2, logs2 = step_fn(state_r, batch_s, rng)

    np.testing.assert_allclose(
        float(logs1["loss_total"]), float(logs2["loss_total"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(logs1["grad_norm"]), float(logs2["grad_norm"]), rtol=1e-4)


@pytest.mark.slow
def test_multislice_mesh_step_matches_flat_mesh():
    """2 'slices' x 4 devices ('dcn','data','model') == flat 8-way data
    mesh: batches shard over ('dcn','data') jointly, grads hierarchically
    reduce (ICI first, then the slice-count-sized DCN all-reduce)."""
    from transformer_tts_tpu.parallel.mesh import make_multislice_mesh
    hp = tiny_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    batch = make_batch(0)
    rng = jax.random.PRNGKey(1)

    flat = make_mesh()
    s1, l1 = step_fn(jax.device_put(state, replicated(flat)),
                     shard_batch(batch, flat), rng)

    ms = make_multislice_mesh(2)
    assert ms.devices.shape == (2, 4, 1)
    assert ms.axis_names == ("dcn", "data", "model")
    s2, l2 = step_fn(jax.device_put(state, replicated(ms)),
                     shard_batch(batch, ms), rng)
    # every batch row lands on exactly one device either way
    sh = batch_sharding(ms)
    assert sh.num_devices == 8

    np.testing.assert_allclose(float(l1["loss_total"]),
                               float(l2["loss_total"]), rtol=1e-5)
    np.testing.assert_allclose(float(l1["grad_norm"]),
                               float(l2["grad_norm"]), rtol=1e-4)
    _, l1b = step_fn(s1, shard_batch(batch, flat), rng)
    _, l2b = step_fn(s2, shard_batch(batch, ms), rng)
    np.testing.assert_allclose(float(l1b["loss_total"]),
                               float(l2b["loss_total"]), rtol=1e-3)
