"""Real-TPU smoke tier: non-interpreted Pallas kernels on the chip.

Every other Pallas test in this suite runs interpret-mode on the CPU
backend (tests/conftest.py forces it); this tier is the on-chip
counterpart — it catches Mosaic/XLA/kernel regressions that interpret
mode cannot. Kept small enough to run in ~2 minutes warm.

Run (serial — the chip is a single shared device):

    TTS_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -m tpu -n0 -q

The default suite never collects these: pytest.ini deselects the `tpu`
marker, and without TTS_TPU_SMOKE=1 the module skips itself (the
conftest has already forced the CPU backend by then).

Reference perf hook being formalized: the reference's only on-device
verification was running real training/synthesis
(/root/reference/test_fastspeech2.py:203-204 timing prints).
"""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("TTS_TPU_SMOKE") != "1":
    pytest.skip("TPU smoke tier: set TTS_TPU_SMOKE=1 and run with -m tpu",
                allow_module_level=True)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

if jax.default_backend() == "cpu":
    pytest.skip("no TPU backend available", allow_module_level=True)

from transformer_tts_tpu.config import HParams                 # noqa: E402
from transformer_tts_tpu.ops.flash_attention import (           # noqa: E402
    flash_attention, reference_attention)
from transformer_tts_tpu.ops.masks import create_masks          # noqa: E402


def _rand_qkv(seed, b=2, h=4, t=256, d=96, dtype=np.float32):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, h, t, d).astype(dtype))
    k = jnp.asarray(rs.randn(b, h, t, d).astype(dtype))
    v = jnp.asarray(rs.randn(b, h, t, d).astype(dtype))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_forward_on_chip(causal):
    # production head dim (d_model 384 / 4 heads = 96), real kernel
    q, k, v = _rand_qkv(0)
    k_len = jnp.array([256, 177], jnp.int32)
    out = flash_attention(q, k, v, k_len, causal=causal)
    ref = reference_attention(q, k, v, k_len, causal)
    # on-chip matmuls run at default (bf16-accumulated) MXU precision in
    # BOTH paths, but the flash kernel's online-softmax rescaling orders
    # the rounding differently — bf16-scale tolerance, not fp32-scale
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=1e-2)


def test_flash_backward_on_chip():
    q, k, v = _rand_qkv(1)
    k_len = jnp.array([256, 200], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, k_len) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, k_len, False) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_flash_relpos_on_chip():
    """The conformer rel-pos kernel (ops/flash_relpos.py) vs the jnp
    RelativeMultiHeadAttention path, end-to-end through the module."""
    from transformer_tts_tpu.ops.attention import (
        RelativeMultiHeadAttention)

    rs = np.random.RandomState(2)
    b, t, d, h = 2, 256, 96, 4            # d_head 24
    x = jnp.asarray(rs.randn(b, t, d).astype(np.float32))
    pos = jnp.asarray(rs.randn(1, t, d).astype(np.float32))
    k_len = jnp.array([t, 193], jnp.int32)
    mask = (jnp.arange(t)[None, :] < k_len[:, None])[:, None, :]

    mod = RelativeMultiHeadAttention(heads=h, d_model=d, dropout=0.0,
                                     use_flash=False)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x, pos, mask,
                         train=False)
    ref_out, _ = mod.apply(variables, x, x, x, pos, mask, train=False)

    mod_f = RelativeMultiHeadAttention(heads=h, d_model=d, dropout=0.0,
                                       use_flash=True)
    flash_out, _ = mod_f.apply(variables, x, x, x, pos, mask,
                               train=False, k_len=k_len)

    valid = np.asarray(mask[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(flash_out)[valid], np.asarray(ref_out)[valid],
        rtol=5e-3, atol=5e-3)


def test_fs2_train_step_on_chip():
    """One jitted FastSpeech2 train step at the production model size
    (d_model 384, 6+6 layers, flash + in-kernel dropout active at
    T=512): loss finite, updated params finite, loss decreases over a
    few steps on a fixed batch."""
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = HParams(amp=True, batch_size=4)
    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng)

    b, lt, tt = 4, 32, 512
    rs = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(
            rs.randint(1, hp.vocab_size, (b, lt)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, tt, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
        "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
    }
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    step_rng = jax.random.key(1, impl=hp.prng_impl)

    s, logs0 = step_fn(state, batch, step_rng)
    first = float(logs0["loss_total"])
    assert np.isfinite(first), logs0
    for _ in range(4):
        s, logs = step_fn(s, batch, step_rng)
    last = float(logs["loss_total"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    flat, _ = jax.tree_util.tree_flatten(s.params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)


def test_engine_warmup_and_synthesize_on_chip():
    """TTSEngine restore -> AOT warmup -> batched synthesize on the
    real chip (the serving path bench.py times)."""
    from transformer_tts_tpu.infer.engine import TTSEngine
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state

    hp = HParams(amp=True, batch_size=4)
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    eng_dir = tempfile.mkdtemp(prefix="tpu_smoke_engine_")
    ckpt.save_checkpoint(eng_dir, state, 1, with_optimizer=False)
    with open(os.path.join(eng_dir, "hparams.py"), "w") as fh:
        fh.write("amp = True\nbatch_size = 4\n")

    l = 64
    engine = TTSEngine(eng_dir, batch_size=2, frames_per_phone=6,
                       text_buckets=(l,))
    engine.warmup()
    rs = np.random.RandomState(1)
    texts = [list(rs.randint(1, hp.vocab_size, l)) for _ in range(2)]
    results = engine.synthesize(texts)
    assert len(results) == 2
    for r in results:
        mel = r["mel"]
        assert mel.shape[-1] == hp.mel_dim
        assert np.isfinite(mel).all()


def test_create_masks_on_chip_matches_cpu_semantics():
    """Cheap guard that the mask path (used by every model) compiles
    and produces the documented semantics on the chip."""
    pos = jnp.asarray([[1, 2, 3, 0], [1, 2, 0, 0]], jnp.int32)
    src_mask, _ = create_masks(pos, None)
    m = np.asarray(src_mask)
    assert m.shape[0] == 2 and m.shape[-1] == 4
    assert m[0, ..., :3].all() and not m[0, ..., 3].any()
    assert m[1, ..., :2].all() and not m[1, ..., 2:].any()
