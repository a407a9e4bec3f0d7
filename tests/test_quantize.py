"""Weight-only int8 quantization (infer/quantize.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_tts_tpu.infer.quantize import (
    dequantize_tree, dequantize_variables, has_quantized_leaves,
    maybe_dequantize_variables, quantization_stats, quantize_tree,
    quantize_variables)


def test_roundtrip_error_within_half_step():
    """Symmetric per-out-channel: |deq - w| <= scale/2 everywhere."""
    rs = np.random.RandomState(0)
    # per-channel magnitudes spanning 30x so one global scale would fail
    w = (rs.randn(32, 128) * np.linspace(0.1, 3.0, 128)[None]
         ).astype(np.float32)
    tree = {"layer": {"kernel": jnp.asarray(w),
                      "bias": jnp.zeros((128,), jnp.float32)}}
    q = quantize_tree(tree, min_size=16)
    assert q["layer"]["kernel"]["q"].dtype == jnp.int8
    assert q["layer"]["kernel"]["s"].shape == (1, 128)
    # 1-D bias passes through untouched
    assert q["layer"]["bias"] is tree["layer"]["bias"]
    deq = np.asarray(dequantize_tree(q)["layer"]["kernel"])
    scale = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(deq - w) <= scale[None, :] / 2 + 1e-7).all()


def test_min_size_and_dtype_gating():
    tree = {"small": jnp.ones((4, 4), jnp.float32),          # < min_size
            "ints": jnp.ones((64, 64), jnp.int32),           # not float
            "big": jnp.ones((64, 64), jnp.float32)}
    q = quantize_tree(tree, min_size=1024)
    assert q["small"] is tree["small"]
    assert q["ints"] is tree["ints"]
    assert q["big"]["q"].dtype == jnp.int8
    assert has_quantized_leaves(q) and not has_quantized_leaves(tree)


def test_conv_kernel_last_axis_channels():
    """Flax conv kernels ((k, in, out)) get one scale per out channel."""
    rs = np.random.RandomState(1)
    w = rs.randn(5, 16, 64).astype(np.float32)
    q = quantize_tree({"conv": {"kernel": jnp.asarray(w)}}, min_size=16)
    assert q["conv"]["kernel"]["s"].shape == (1, 1, 64)


def test_maybe_dequantize_is_identity_for_fp_trees():
    v = {"params": {"kernel": jnp.ones((64, 64), jnp.float32)},
         "batch_stats": {}}
    assert maybe_dequantize_variables(v) is v
    qv = quantize_variables(v, min_size=16)
    # batch_stats never quantized
    assert qv["batch_stats"] is v["batch_stats"]
    out = maybe_dequantize_variables(qv)
    assert out is not qv
    np.testing.assert_allclose(np.asarray(out["params"]["kernel"]),
                               np.asarray(v["params"]["kernel"]),
                               atol=1e-6)


def test_quantization_stats_compression():
    params = {"a": jnp.ones((128, 128), jnp.float32),
              "b": jnp.ones((8,), jnp.float32)}
    q = quantize_tree(params, min_size=1024)
    s = quantization_stats(params, q)
    assert s["n_quantized"] == 1 and s["n_passthrough"] == 1
    # fp32 -> int8 + (1,128) f32 scale: close to 4x on the big leaf
    assert 3.5 < s["compression"] < 4.0


def test_fs2_forward_quantized_close_and_fused_in_jit():
    """Dequantize-inside-jit forward stays close to the fp forward."""
    from tests.test_models import make_batch, tiny_hp
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state

    hp = tiny_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    batch = make_batch(0)
    src_mask, mel_mask = create_masks(batch["pos_text"], batch["pos_mel"])
    v = {"params": state.params, "batch_stats": state.batch_stats,
         "vq_stats": {}}
    qv = quantize_variables(v, min_size=256)
    assert has_quantized_leaves(qv["params"])

    @jax.jit
    def fwd(variables):
        variables = maybe_dequantize_variables(variables)
        return model.apply(
            variables, batch["text"], src_mask, 48, batch["alignment"],
            batch["f0"], batch["energy"], mel_mask=mel_mask,
            train=False).mel_post

    mel_fp = np.asarray(fwd(v), np.float32)
    mel_q = np.asarray(fwd(qv), np.float32)
    # weight-only int8 per-channel: small relative output error
    rel = np.abs(mel_q - mel_fp).mean() / (np.abs(mel_fp).mean() + 1e-8)
    assert rel < 0.05, rel


def test_ar_decode_quantized_smoke():
    """KV-cached AR decode accepts a quantized tree (caches stay fp)."""
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_transformer_tts)
    from transformer_tts_tpu.train.trainer import init_transformer_state

    hp = HParams(model="Transformer", d_model_encoder=32,
                 d_model_decoder=32, n_layer_encoder=1, n_layer_decoder=1,
                 n_head_encoder=2, n_head_decoder=2, vocab_size=20,
                 mel_dim=8, amp=False, ff_conv_kernel_size_decoder=1,
                 optimizer="Noam", warmup_step=10, batch_size=2)
    model, state = init_transformer_state(hp, jax.random.PRNGKey(0))
    v = {"params": state.params, "batch_stats": state.batch_stats,
         "vq_stats": {}}
    qv = quantize_variables(v, min_size=64)
    assert has_quantized_leaves(qv["params"])
    text = jnp.asarray(np.arange(1, 7)[None].repeat(2, 0), jnp.int32)
    pos = jnp.asarray(np.arange(1, 7)[None].repeat(2, 0), jnp.int32)
    mel, lengths = synthesize_transformer_tts(
        model, qv, text, pos, max_steps=8)
    assert np.isfinite(np.asarray(mel)).all()
    assert mel.shape[0] == 2


@pytest.mark.slow
def test_engine_int8_end_to_end(tmp_path):
    """TTSEngine(quantize='int8'): trains a tiny model through the CLI,
    serves it quantized, compares against the fp engine."""
    from tests.test_cli import write_hp, MEL_DIM
    rs = np.random.RandomState(0)
    lines = []
    for i in range(4):
        t_text = rs.randint(4, 8)
        t_mel = t_text * 3
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), 3, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(lines[:2]) + "\n")
    hp_path, save_dir = write_hp(tmp_path, tmp_path, max_epoch=1)
    from transformer_tts_tpu.cli import train as cli_train
    cli_train.main(["--hp_file", hp_path])

    from transformer_tts_tpu.infer.engine import TTSEngine
    fp = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                   text_buckets=(8,))
    q8 = TTSEngine(save_dir, batch_size=2, frames_per_phone=4,
                   text_buckets=(8,), quantize="int8")
    assert q8.quantize_stats["n_quantized"] > 0
    assert q8.quantize_stats["compression"] > 2.0
    q8.warmup()

    texts = [[1, 2, 3], [4, 5, 6, 7, 2]]
    r_fp = fp.synthesize(texts)
    r_q = q8.synthesize(texts)
    for t, a, b in zip(texts, r_fp, r_q):
        assert b["durations"].shape == (len(t),)
        assert b["mel"].shape[0] == int(b["durations"].sum())
        assert np.isfinite(b["mel"]).all()
        # duration rounding can differ by a frame on a barely-trained
        # model; compare mel over the common prefix
        n = min(a["mel"].shape[0], b["mel"].shape[0])
        if n:
            rel = (np.abs(a["mel"][:n] - b["mel"][:n]).mean()
                   / (np.abs(a["mel"][:n]).mean() + 1e-8))
            assert rel < 0.1, rel

    # export with int8 weights baked: artifact loads and runs
    import json
    from jax import export as jexport
    out_dir = str(tmp_path / "exported_q8")
    manifest = q8.export(out_dir)
    with open(f"{out_dir}/{manifest['buckets']['8']['file']}", "rb") as fh:
        exp = jexport.deserialize(fh.read())
    text = np.zeros((2, 8), np.int32)
    pos = np.zeros((2, 8), np.int32)
    text[0, :3] = [1, 2, 3]
    pos[0, :3] = [1, 2, 3]
    mel, mel_len, dur = exp.call(jnp.asarray(text), jnp.asarray(pos))
    assert np.isfinite(np.asarray(mel)).all()
