"""Numerical parity vs the PyTorch reference implementation.

Builds the reference FastSpeech2 (torch, CPU, eval, dropouts 0), converts
its weights through ``compat.torch_import``, runs both forwards on the
same teacher-forced inputs and compares mel outputs — the "mel-L1 parity
within fp32 tolerance" acceptance criterion (BASELINE.md).

The reference code is imported from /root/reference (read-only) with a
stub for its stray ``itsdangerous`` import (fastspeech2.py:2 imports it
but never uses it, and the package is absent here).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# stub junk imports the reference never uses
sys.modules.setdefault(
    "itsdangerous", types.SimpleNamespace(NoneAlgorithm=None))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    from Models.fastspeech2 import FastSpeech2 as TorchFastSpeech2
    HAVE_REF = True
except Exception:          # pragma: no cover - reference not mounted
    HAVE_REF = False

import jax
import jax.numpy as jnp

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.compat.torch_import import (
    convert_fastspeech2_state_dict)
from transformer_tts_tpu.ops.masks import create_masks
from transformer_tts_tpu.train.trainer import (
    build_fastspeech2, init_fastspeech2_state)

pytestmark = [
    pytest.mark.skipif(not HAVE_REF,
                       reason="reference repo not importable"),
    pytest.mark.slow,
]


class _RefHP:
    """Attribute bag for the reference model's hp keyword accesses."""
    encoder_type = "transformer"
    decoder_type = "transformer"
    use_sq_vae = False
    use_hop = False
    use_rnn_length = False
    use_pos = False
    postnet_pred = True
    p_scheduled_sampling = 0.0
    version = None
    semantic_mask = False


def build_pair(seed=0, postnet_pred=True):
    cfg = dict(vocab_size=30, mel_dim=8, d_model_encoder=32,
               n_layer_encoder=2, n_head_encoder=2,
               ff_conv_kernel_size_encoder=3, d_model_decoder=32,
               n_layer_decoder=2, n_head_decoder=2,
               ff_conv_kernel_size_decoder=1)
    hp = HParams(amp=False, batch_size=2, postnet_pred=postnet_pred,
                 use_flash_attention=False, **cfg)
    ref_hp = _RefHP()
    ref_hp.postnet_pred = postnet_pred

    torch.manual_seed(seed)
    tmodel = TorchFastSpeech2(
        ref_hp, src_vocab=cfg["vocab_size"], trg_vocab=cfg["mel_dim"],
        d_model_encoder=cfg["d_model_encoder"],
        N_e=cfg["n_layer_encoder"], n_head_encoder=cfg["n_head_encoder"],
        ff_conv_kernel_size_encoder=cfg["ff_conv_kernel_size_encoder"],
        concat_after_encoder=False,
        d_model_decoder=cfg["d_model_decoder"],
        N_d=cfg["n_layer_decoder"], n_head_decoder=cfg["n_head_decoder"],
        ff_conv_kernel_size_decoder=cfg["ff_conv_kernel_size_decoder"],
        concat_after_decoder=False, reduction_rate=1,
        dropout=0.0, dropout_postnet=0.0, dropout_variance_adaptor=0.0,
        n_bins=256, f0_min=71.0, f0_max=795.8, energy_min=0.0,
        energy_max=315.0, pitch_pred=True, energy_pred=True,
        accent_emb=False, multi_speaker=False, spk_emb_dim=None,
        spk_emb_architecture=(), debug=False)
    tmodel.eval()

    jmodel = build_fastspeech2(hp)
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    params, bstats = convert_fastspeech2_state_dict(
        tmodel.state_dict(), hp)
    # keep tree structure identical to the flax init (sanity)
    ref_leaves = jax.tree.structure(state.params)
    got_leaves = jax.tree.structure(params)
    assert ref_leaves == got_leaves, (
        f"param tree mismatch:\n{ref_leaves}\nvs\n{got_leaves}")
    return hp, tmodel, jmodel, params, bstats


def test_weight_conversion_tree_matches():
    build_pair()


def test_fastspeech2_forward_parity_teacher_forced():
    hp, tmodel, jmodel, params, bstats = build_pair()
    rs = np.random.RandomState(1)
    b, l, t = 2, 6, 18
    text = rs.randint(1, 30, (b, l)).astype(np.int64)
    d_target = np.full((b, l), 3, np.int64)
    f0 = (rs.rand(b, t) * 300 + 80).astype(np.float32)
    energy = (rs.rand(b, t) * 100).astype(np.float32)

    # torch forward
    src_mask_t = torch.ones((b, 1, l), dtype=torch.bool)
    mel_mask_t = torch.ones((b, 1, t), dtype=torch.bool)
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(text), src_mask_t, mel_mask_t,
            torch.tensor(d_target), torch.tensor(f0),
            torch.tensor(energy), None, spkr_emb=None, fix_mask=None,
            temperature=None)
    t_pre = t_out[0].numpy()
    t_post = t_out[1].numpy()
    t_logd = t_out[2].numpy()
    t_pitch = t_out[3].numpy()
    t_energy = t_out[4].numpy()

    # jax forward
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    pos_mel = jnp.tile(jnp.arange(1, t + 1)[None], (b, 1))
    src_mask, mel_mask = create_masks(pos_text, pos_mel)
    j_out = jmodel.apply(
        {"params": params, "batch_stats": bstats, "vq_stats": {}},
        jnp.asarray(text.astype(np.int32)), src_mask, t,
        jnp.asarray(d_target.astype(np.int32)), jnp.asarray(f0),
        jnp.asarray(energy), mel_mask=mel_mask, train=False)

    np.testing.assert_allclose(np.asarray(j_out.log_duration), t_logd,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out.pitch), t_pitch,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out.energy), t_energy,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out.mel_pre), t_pre,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out.mel_post), t_post,
                               rtol=1e-4, atol=2e-4)
    # headline metric: mel-L1 between implementations ~ 0
    mel_l1 = np.abs(np.asarray(j_out.mel_post) - t_post).mean()
    assert mel_l1 < 1e-5, mel_l1


def test_fastspeech2_forward_parity_no_postnet():
    hp, tmodel, jmodel, params, bstats = build_pair(seed=3,
                                                    postnet_pred=False)
    rs = np.random.RandomState(2)
    b, l, t = 1, 5, 15
    text = rs.randint(1, 30, (b, l)).astype(np.int64)
    d_target = np.full((b, l), 3, np.int64)
    f0 = (rs.rand(b, t) * 300 + 80).astype(np.float32)
    energy = (rs.rand(b, t) * 100).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(text), torch.ones((b, 1, l), dtype=torch.bool),
            torch.ones((b, 1, t), dtype=torch.bool),
            torch.tensor(d_target), torch.tensor(f0),
            torch.tensor(energy), None, spkr_emb=None, fix_mask=None,
            temperature=None)
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    pos_mel = jnp.tile(jnp.arange(1, t + 1)[None], (b, 1))
    src_mask, mel_mask = create_masks(pos_text, pos_mel)
    j_out = jmodel.apply(
        {"params": params, "batch_stats": bstats, "vq_stats": {}},
        jnp.asarray(text.astype(np.int32)), src_mask, t,
        jnp.asarray(d_target.astype(np.int32)), jnp.asarray(f0),
        jnp.asarray(energy), mel_mask=mel_mask, train=False)
    np.testing.assert_allclose(np.asarray(j_out.mel_pre), t_out[0].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_transformer_tts_forward_parity():
    """AR Transformer teacher-forced parity vs the reference torch model.

    Compares mel_pre and stop logits exactly; the reference's mel_post is
    its own input (the prev_version=False postnet bug, postnets.py:76-79)
    so it is checked against our ``identity_compat`` variant.
    """
    sys.modules.setdefault(
        "itsdangerous", types.SimpleNamespace(NoneAlgorithm=None))
    from Models.transformer import Transformer as TorchTransformer
    from transformer_tts_tpu.models.transformer_tts import TransformerTTS
    from transformer_tts_tpu.compat.torch_import import (
        convert_transformer_state_dict)

    class _HP:
        gst = False
        encoder_type = "transformer"

    cfg = dict(vocab_size=30, mel_dim=8, d_model_encoder=32,
               n_layer_encoder=2, n_head_encoder=2,
               ff_conv_kernel_size_encoder=3, d_model_decoder=32,
               n_layer_decoder=2, n_head_decoder=2,
               ff_conv_kernel_size_decoder=1, reduction_rate=2)
    hp = HParams(amp=False, batch_size=2, model="Transformer",
                 use_flash_attention=False, **cfg)

    torch.manual_seed(7)
    tmodel = TorchTransformer(
        _HP(), src_vocab=cfg["vocab_size"], trg_vocab=cfg["mel_dim"],
        d_model_encoder=cfg["d_model_encoder"],
        N_e=cfg["n_layer_encoder"], n_head_encoder=cfg["n_head_encoder"],
        ff_conv_kernel_size_encoder=cfg["ff_conv_kernel_size_encoder"],
        concat_after_encoder=False,
        d_model_decoder=cfg["d_model_decoder"],
        N_d=cfg["n_layer_decoder"], n_head_decoder=cfg["n_head_decoder"],
        ff_conv_kernel_size_decoder=cfg["ff_conv_kernel_size_decoder"],
        concat_after_decoder=False,
        reduction_rate=cfg["reduction_rate"], dropout=0.0,
        dropout_prenet=0.0, dropout_postnet=0.0, multi_speaker=False,
        spk_emb_dim=None, spk_emb_architecture=(), output_type=None,
        decoder_type="transformer")
    tmodel.eval()

    jmodel = TransformerTTS(
        vocab_size=cfg["vocab_size"], mel_dim=cfg["mel_dim"],
        d_model_encoder=cfg["d_model_encoder"],
        n_layer_encoder=cfg["n_layer_encoder"],
        n_head_encoder=cfg["n_head_encoder"],
        ff_conv_kernel_size_encoder=cfg["ff_conv_kernel_size_encoder"],
        d_model_decoder=cfg["d_model_decoder"],
        n_layer_decoder=cfg["n_layer_decoder"],
        n_head_decoder=cfg["n_head_decoder"],
        ff_conv_kernel_size_decoder=cfg["ff_conv_kernel_size_decoder"],
        reduction_rate=cfg["reduction_rate"], dropout=0.0,
        dropout_prenet=0.0, dropout_postnet=0.0,
        postnet_identity_compat=True)
    params, bstats = convert_transformer_state_dict(
        tmodel.state_dict(), hp)

    rs = np.random.RandomState(11)
    b, l, t = 2, 7, 10     # t decoder positions (reduced frames)
    text = rs.randint(1, 30, (b, l)).astype(np.int64)
    trg = rs.randn(b, t, cfg["mel_dim"]).astype(np.float32)

    # torch masks: (B,1,L) pad + (B,T,T) causal
    src_mask_t = torch.ones((b, 1, l), dtype=torch.bool)
    causal = torch.tril(torch.ones((t, t), dtype=torch.bool))
    trg_mask_t = causal[None].expand(b, t, t)
    with torch.no_grad():
        t_pre, t_post, t_stop, _, _, _ = tmodel(
            torch.tensor(text), torch.tensor(trg), src_mask_t, trg_mask_t,
            None, training=True)

    from transformer_tts_tpu.ops.masks import create_masks
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (b, 1))
    pos_mel = jnp.tile(jnp.arange(1, t + 1)[None], (b, 1))
    src_mask, trg_mask = create_masks(pos_text, pos_mel,
                                      model="transformer")
    variables = {"params": params, "batch_stats": bstats}
    j_out = jmodel.apply(variables, jnp.asarray(text.astype(np.int32)),
                         jnp.asarray(trg), src_mask, trg_mask,
                         train=False)

    np.testing.assert_allclose(np.asarray(j_out.mel_pre), t_pre.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out.stop_token),
                               t_stop.numpy().reshape(
                                   j_out.stop_token.shape),
                               rtol=1e-4, atol=1e-4)
    # reference postnet bug: mel_post == mel_pre; identity_compat matches
    np.testing.assert_allclose(np.asarray(j_out.mel_post), t_post.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_conformer_encoder_parity():
    """ConformerEncoder stack parity (relative MHA + conv module)."""
    from Models.encoder import ConformerEncoder as TorchConformer
    from transformer_tts_tpu.models.encoder import ConformerEncoder
    from transformer_tts_tpu.compat.torch_import import (
        convert_conformer_encoder_state_dict)

    d, heads, n_layers, vocab = 32, 2, 2, 25
    torch.manual_seed(5)
    tmodel = TorchConformer(vocab, d, n_layers, heads,
                            ff_conv_kernel_size=3,
                            concat_after_encoder=False, dropout=0.0,
                            embedding=True)
    tmodel.eval()

    jmodel = ConformerEncoder(vocab_size=vocab, d_model=d,
                              n_layers=n_layers, heads=heads,
                              ff_kernel_size=3, dropout=0.0,
                              embedding=True)
    params, bstats = convert_conformer_encoder_state_dict(
        tmodel.state_dict(), n_layers)

    rs = np.random.RandomState(3)
    b, l = 2, 9
    src = rs.randint(1, vocab, (b, l)).astype(np.int64)
    mask_t = torch.ones((b, 1, l), dtype=torch.bool)
    with torch.no_grad():
        t_out, _ = tmodel(torch.tensor(src), mask_t)

    mask_j = jnp.ones((b, 1, l), bool)
    j_out, _ = jmodel.apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(src.astype(np.int32)), mask_j, train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=2e-4, atol=2e-4)
