"""Convert reference PyTorch checkpoints into this framework's params.

The reference saves ``model.state_dict()`` as ``network.epoch{N}``
(train_fastspeech2.py:316-322). This module maps those tensors onto the
flax parameter tree so users can migrate trained models without
retraining. Layout rules:

  torch nn.Linear.weight (out, in)      -> Dense kernel (in, out)   [T]
  torch nn.Conv1d.weight (out, in, k)   -> Conv kernel (k, in, out) [T]
  torch nn.Embedding.weight             -> Embed embedding          [=]
  torch LayerNorm weight/bias           -> LayerNorm scale/bias     [=]
  torch BatchNorm1d weight/bias         -> BatchNorm scale/bias     [=]
        running_mean/var               -> batch_stats mean/var      [=]

Also strips the ``module.`` DataParallel prefix like the reference's
``load_model`` (utils/utils.py:107-134).

Covers every reference-trainable model family:

* FastSpeech2 (transformer encoder/decoder, variance adaptor, postnet)
  — ``convert_fastspeech2_state_dict``
* AR Transformer-TTS incl. GST style embedding (Models/gst.py:11-74)
  and the Tacotron2 decoder variant (Models/decoder.py:58-335)
  — ``convert_transformer_state_dict``
* Conformer encoder stacks — ``convert_conformer_encoder_state_dict``
* PostLowEnergy v1/v2 mel-mel students (Models/postnets.py:82-217,
  incl. the EMA ``Quantize`` buffers)
  — ``convert_post_low_energy_state_dict``
* SQ-VAE FastSpeech2 (Models/fastspeech2_sq.py,
  varianceadaptor_sq.py) — ``convert_sq_fastspeech2_state_dict``
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _strip_module_prefix(state: Dict) -> Dict:
    if state and next(iter(state)).startswith("module."):
        return {k[len("module."):]: v for k, v in state.items()}
    return dict(state)


def _to_np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_linear(params, bstats, flax_path, state, torch_name):
    _set(params, flax_path + ("kernel",),
         _to_np(state[torch_name + ".weight"]).T)
    if torch_name + ".bias" in state:
        _set(params, flax_path + ("bias",),
             _to_np(state[torch_name + ".bias"]))


def _map_conv1d(params, bstats, flax_path, state, torch_name):
    w = _to_np(state[torch_name + ".weight"])       # (out, in, k)
    _set(params, flax_path + ("kernel",), w.transpose(2, 1, 0))
    if torch_name + ".bias" in state:
        _set(params, flax_path + ("bias",),
             _to_np(state[torch_name + ".bias"]))


def _map_embed(params, bstats, flax_path, state, torch_name):
    _set(params, flax_path + ("embedding",),
         _to_np(state[torch_name + ".weight"]))


def _map_ln(params, bstats, flax_path, state, torch_name):
    _set(params, flax_path + ("scale",),
         _to_np(state[torch_name + ".weight"]))
    _set(params, flax_path + ("bias",), _to_np(state[torch_name + ".bias"]))


def _map_bn(params, bstats, flax_path, state, torch_name):
    _set(params, flax_path + ("scale",),
         _to_np(state[torch_name + ".weight"]))
    _set(params, flax_path + ("bias",), _to_np(state[torch_name + ".bias"]))
    _set(bstats, flax_path + ("mean",),
         _to_np(state[torch_name + ".running_mean"]))
    _set(bstats, flax_path + ("var",),
         _to_np(state[torch_name + ".running_var"]))


def _map_mha(params, bstats, flax_path, state, torch_name):
    for part in ("q_linear", "k_linear", "v_linear", "out"):
        _map_linear(params, bstats, flax_path + (part,), state,
                    f"{torch_name}.{part}")


def _map_encoder_layer(params, bstats, flax_path, state, torch_name):
    _map_ln(params, bstats, flax_path + ("norm_1",), state,
            f"{torch_name}.norm_1")
    _map_ln(params, bstats, flax_path + ("norm_2",), state,
            f"{torch_name}.norm_2")
    _map_mha(params, bstats, flax_path + ("attn",), state,
             f"{torch_name}.attn")
    _map_conv1d(params, bstats, flax_path + ("ff", "f_1"), state,
                f"{torch_name}.ff.f_1")
    _map_conv1d(params, bstats, flax_path + ("ff", "f_2"), state,
                f"{torch_name}.ff.f_2")
    _map_ln(params, bstats, flax_path + ("ff", "layer_norm"), state,
            f"{torch_name}.ff.layer_norm")


def _map_encoder_stack(params, bstats, flax_prefix, state, torch_prefix,
                       n_layers, embedding=True):
    if embedding:
        _map_embed(params, bstats, flax_prefix + ("embed",), state,
                   f"{torch_prefix}.embed")
    else:
        _map_linear(params, bstats, flax_prefix + ("embed",), state,
                    f"{torch_prefix}.embed")
    _set(params, flax_prefix + ("pe", "alpha"),
         _to_np(state[f"{torch_prefix}.pe.alpha"]))
    for i in range(n_layers):
        _map_encoder_layer(params, bstats, flax_prefix + (f"layers_{i}",),
                           state, f"{torch_prefix}.layers.{i}")
    _map_ln(params, bstats, flax_prefix + ("norm",), state,
            f"{torch_prefix}.norm")


def _map_variance_predictor(params, bstats, flax_prefix, state,
                            torch_prefix):
    _map_conv1d(params, bstats, flax_prefix + ("conv1",), state,
                f"{torch_prefix}.conv1")
    _map_conv1d(params, bstats, flax_prefix + ("conv2",), state,
                f"{torch_prefix}.conv2")
    _map_ln(params, bstats, flax_prefix + ("layer_norm1",), state,
            f"{torch_prefix}.layer_norm1")
    _map_ln(params, bstats, flax_prefix + ("layer_norm2",), state,
            f"{torch_prefix}.layer_norm2")
    _map_linear(params, bstats, flax_prefix + ("linear_layer",), state,
                f"{torch_prefix}.linear_layer")


def convert_fastspeech2_state_dict(
    state_dict: Dict, hp,
) -> Tuple[Dict, Dict]:
    """Reference FastSpeech2 state_dict -> (params, batch_stats) trees.

    Supports the transformer encoder/decoder configuration with the
    standard variance adaptor and PostConvNet/Dense output head.
    """
    state = _strip_module_prefix(state_dict)
    params: Dict = {}
    bstats: Dict = {}

    _map_encoder_stack(params, bstats, ("encoder",), state, "encoder",
                       hp.n_layer_encoder, embedding=True)
    _map_encoder_stack(params, bstats, ("decoder",), state, "decoder",
                       hp.n_layer_decoder, embedding=False)

    va = ("variance_adaptor",)
    _map_variance_predictor(params, bstats, va + ("duration_predictor",),
                            state, "variance_adaptor.duration_predictor")
    if hp.pitch_pred:
        _map_variance_predictor(params, bstats, va + ("pitch_predictor",),
                                state, "variance_adaptor.pitch_predictor")
        _map_embed(params, bstats, va + ("pitch_embedding",), state,
                   "variance_adaptor.pitch_embedding")
    if hp.energy_pred:
        _map_variance_predictor(params, bstats, va + ("energy_predictor",),
                                state, "variance_adaptor.energy_predictor")
        _map_embed(params, bstats, va + ("energy_embedding",), state,
                   "variance_adaptor.energy_embedding")

    if hp.postnet_pred:
        pn = ("postnet",)
        _map_linear(params, bstats, pn + ("out",), state, "postnet.out")
        _map_conv1d(params, bstats, pn + ("conv1",), state, "postnet.conv1")
        _map_conv1d(params, bstats, pn + ("conv2",), state, "postnet.conv2")
        _map_bn(params, bstats, pn + ("pre_batchnorm",), state,
                "postnet.pre_batchnorm")
        for i in range(3):
            _map_conv1d(params, bstats, pn + (f"conv_list_{i}",), state,
                        f"postnet.conv_list.{i}")
            _map_bn(params, bstats, pn + (f"batch_norm_list_{i}",), state,
                    f"postnet.batch_norm_list.{i}")
    else:
        _map_linear(params, bstats, ("out",), state, "out")
    return params, bstats


def load_reference_checkpoint(path: str, hp):
    """torch.load a reference ``network.epoch{N}`` file and convert."""
    import torch
    state = torch.load(path, map_location="cpu")
    return convert_fastspeech2_state_dict(state, hp)


def _map_decoder_layer(params, bstats, flax_path, state, torch_name):
    for n in ("norm_1", "norm_2", "norm_3"):
        _map_ln(params, bstats, flax_path + (n,), state,
                f"{torch_name}.{n}")
    _map_mha(params, bstats, flax_path + ("attn_1",), state,
             f"{torch_name}.attn_1")
    _map_mha(params, bstats, flax_path + ("attn_2",), state,
             f"{torch_name}.attn_2")
    _map_conv1d(params, bstats, flax_path + ("ff", "f_1"), state,
                f"{torch_name}.ff.f_1")
    _map_conv1d(params, bstats, flax_path + ("ff", "f_2"), state,
                f"{torch_name}.ff.f_2")
    _map_ln(params, bstats, flax_path + ("ff", "layer_norm"), state,
            f"{torch_name}.ff.layer_norm")


def _map_gru(params, flax_path, state, torch_name):
    """torch ``nn.GRU`` (1 layer, batch_first) -> flax ``nn.RNN(GRUCell)``.

    torch packs the (r, z, n) gates along dim 0 of weight_ih/hh_l0; flax
    keeps six Dense submodules under ``<rnn>/cell``. The formulations are
    exactly equivalent: flax sums the input and hidden r/z projections
    before the bias, so ``ir.bias = b_ir + b_hr`` (same for z); the n
    gate keeps both biases because torch computes
    ``tanh(W_in x + b_in + r * (W_hn h + b_hn))`` and flax mirrors it
    with ``in.bias = b_in`` and ``hn.bias = b_hn``.
    """
    wi = _to_np(state[f"{torch_name}.weight_ih_l0"])    # (3H, in)
    wh = _to_np(state[f"{torch_name}.weight_hh_l0"])    # (3H, H)
    bi = _to_np(state[f"{torch_name}.bias_ih_l0"])
    bh = _to_np(state[f"{torch_name}.bias_hh_l0"])
    h = wh.shape[1]
    cell = flax_path
    for g, nm in enumerate(("r", "z", "n")):
        sl = slice(g * h, (g + 1) * h)
        _set(params, cell + (f"i{nm}", "kernel"), wi[sl].T)
        _set(params, cell + (f"h{nm}", "kernel"), wh[sl].T)
    _set(params, cell + ("ir", "bias"), bi[0:h] + bh[0:h])
    _set(params, cell + ("iz", "bias"), bi[h:2 * h] + bh[h:2 * h])
    _set(params, cell + ("in", "bias"), bi[2 * h:3 * h])
    _set(params, cell + ("hn", "bias"), bh[2 * h:3 * h])


def convert_style_embedding(params, bstats, state,
                            prefix: str = "style_embedding"):
    """Reference GST ``StyleEmbedding`` (Models/gst.py:11-74) subtrees.

    ReferenceEncoder: six 3x3/stride-2 Conv2d (NCHW (out,in,3,3) ->
    flax NHWC kernel (3,3,in,out)) + BatchNorm2d + a 128-unit GRU;
    StyleTokenLayer: the 10x384 token table + its 4-head MHA.
    """
    re_t = f"{prefix}.reference_encoder"
    re_f = (prefix, "reference_encoder")
    for i in range(6):
        w = _to_np(state[f"{re_t}.conv_layers.{i}.weight"])
        _set(params, re_f + (f"conv_{i}", "kernel"), w.transpose(2, 3, 1, 0))
        _map_bn(params, bstats, re_f + (f"norm_{i}",), state,
                f"{re_t}.norm.{i}")
    _map_gru(params, re_f + ("gru_cell",), state, f"{re_t}.gru")
    stl_t = f"{prefix}.style_token_layer"
    stl_f = (prefix, "style_token_layer")
    _set(params, stl_f + ("embeddings",),
         _to_np(state[f"{stl_t}.embeddings"]))
    _map_mha(params, bstats, stl_f + ("attention",), state,
             f"{stl_t}.attention")


# hand-rolled zoneout-LSTM decoder (Models/decoder.py:58-335): every
# sublayer is a plain Linear/Conv1d whose attribute name this package
# reuses verbatim, so the map is mechanical
_TACOTRON2_LINEARS = (
    "speaker_embeddings", "L_spkr2s1", "L_spkr2s2", "speaker_L_l1_es",
    "L_l1_ys", "L_l1_ss", "L_l1_gs", "L_l2_is", "L_l2_ss",
    "FrameProj", "TokenProj", "Prenet1", "Prenet2",
    "AttentionConvProj", "AttentionEncoderProj", "AttentionDecoderProj",
    "AttentionSelfProj")


def _map_tacotron2_decoder(params, bstats, state,
                           torch_prefix: str = "decoder"):
    for n in _TACOTRON2_LINEARS:
        key = f"{torch_prefix}.{n}.weight"
        if key not in state:
            continue                       # speaker branches are optional
        if n == "speaker_embeddings" and f"{torch_prefix}.{n}.bias" \
                not in state:
            # nn.Embedding speaker table (decoder.py:72)
            _map_embed(params, bstats, ("decoder", n), state,
                       f"{torch_prefix}.{n}")
        else:
            _map_linear(params, bstats, ("decoder", n), state,
                        f"{torch_prefix}.{n}")
    _map_conv1d(params, bstats, ("decoder", "AttentionConv"), state,
                f"{torch_prefix}.AttentionConv")


def convert_transformer_state_dict(state_dict: Dict, hp):
    """Reference AR Transformer state_dict -> (params, batch_stats).

    Covers the transformer encoder + AR decoder + out/stop heads + causal
    postnet (Models/transformer.py:15-118), the GST style embedding
    (hp.gst), and the Tacotron2 decoder variant (hp.decoder_type,
    Models/decoder.py:58-335 — frame/stop heads live inside it).
    """
    state = _strip_module_prefix(state_dict)
    params: Dict = {}
    bstats: Dict = {}

    _map_encoder_stack(params, bstats, ("encoder",), state, "encoder",
                       hp.n_layer_encoder, embedding=True)
    if hp.d_model_encoder != hp.d_model_decoder:
        _map_linear(params, bstats, ("linear",), state, "linear")
    if getattr(hp, "gst", False):
        convert_style_embedding(params, bstats, state)

    if getattr(hp, "decoder_type", "transformer").lower() == "tacotron2":
        _map_tacotron2_decoder(params, bstats, state)
    else:
        dec = ("decoder",)
        _map_linear(params, bstats, dec + ("decoder_prenet", "fc1"), state,
                    "decoder.decoder_prenet.layer.fc1")
        _map_linear(params, bstats, dec + ("decoder_prenet", "fc2"), state,
                    "decoder.decoder_prenet.layer.fc2")
        _set(params, dec + ("pe", "alpha"),
             _to_np(state["decoder.pe.alpha"]))
        for i in range(hp.n_layer_decoder):
            _map_decoder_layer(params, bstats, dec + (f"layers_{i}",),
                               state, f"decoder.layers.{i}")
        _map_ln(params, bstats, dec + ("norm",), state, "decoder.norm")

        _map_linear(params, bstats, ("out",), state, "out")
        _map_linear(params, bstats, ("stop_token",), state, "stop_token")

    pn = ("postnet",)
    # AR postnet is prev_version=False: conv stack only, no 'out' Dense
    _map_conv1d(params, bstats, pn + ("conv1",), state, "postnet.conv1")
    _map_conv1d(params, bstats, pn + ("conv2",), state, "postnet.conv2")
    _map_bn(params, bstats, pn + ("pre_batchnorm",), state,
            "postnet.pre_batchnorm")
    for i in range(3):
        _map_conv1d(params, bstats, pn + (f"conv_list_{i}",), state,
                    f"postnet.conv_list.{i}")
        _map_bn(params, bstats, pn + (f"batch_norm_list_{i}",), state,
                f"postnet.batch_norm_list.{i}")
    return params, bstats


def convert_conformer_encoder_state_dict(state_dict: Dict, n_layers: int,
                                         prefix: str = ""):
    """Reference ConformerEncoder (Models/encoder.py:115-160) -> trees.

    Maps per layer: macaron FFNs (linear1/linear2 + LN), the relative MHA
    (q/k/v/out + linear_pos + pos_bias_u/v), and the convolution module
    (pointwise convs, depthwise conv + its fused 1x1, BatchNorm).
    """
    state = _strip_module_prefix(state_dict)
    p = (prefix + ".") if prefix else ""
    params: Dict = {}
    bstats: Dict = {}

    if f"{p}embed.weight" in state and state[
            f"{p}embed.weight"].dim() == 2 and \
            f"{p}embed.bias" not in state:
        _map_embed(params, bstats, ("embed",), state, f"{p}embed")
    else:
        _map_linear(params, bstats, ("embed",), state, f"{p}embed")

    for i in range(n_layers):
        t = f"{p}layers.{i}"
        f = (f"layers_{i}",)
        for ff in ("ff_1", "ff_2"):
            _map_ln(params, bstats, f + (ff, "layer_norm"), state,
                    f"{t}.{ff}.layer_norm")
            _map_linear(params, bstats, f + (ff, "linear1"), state,
                        f"{t}.{ff}.linear1")
            _map_linear(params, bstats, f + (ff, "linear2"), state,
                        f"{t}.{ff}.linear2")
        _map_ln(params, bstats, f + ("norm",), state, f"{t}.norm")
        a = f + ("attn",)
        for part in ("q_linear", "k_linear", "v_linear", "out"):
            _map_linear(params, bstats, a + (part,), state,
                        f"{t}.attn.{part}")
        _map_linear(params, bstats, a + ("linear_pos",), state,
                    f"{t}.attn.linear_pos")
        _set(params, a + ("pos_bias_u",),
             _to_np(state[f"{t}.attn.pos_bias_u"]))
        _set(params, a + ("pos_bias_v",),
             _to_np(state[f"{t}.attn.pos_bias_v"]))
        c = f + ("conv_module",)
        _map_ln(params, bstats, c + ("layer_norm",), state,
                f"{t}.conv_module.layer_norm")
        _map_conv1d(params, bstats, c + ("pointwise_conv1",), state,
                    f"{t}.conv_module.pointwise_conv1")
        _map_conv1d(params, bstats, c + ("pointwise_conv2",), state,
                    f"{t}.conv_module.pointwise_conv2")
        # DepthwiseConv: grouped conv (out,1,k) -> flax depthwise
        # (k, 1, out) with feature_group_count=out
        w = _to_np(state[f"{t}.conv_module.depth_conv1.conv.weight"])
        _set(params, c + ("depthwise_conv", "kernel"), w.transpose(2, 1, 0))
        _set(params, c + ("depthwise_conv", "bias"),
             _to_np(state[f"{t}.conv_module.depth_conv1.conv.bias"]))
        _map_conv1d(params, bstats, c + ("depthwise_out",), state,
                    f"{t}.conv_module.depth_conv1.conv_out")
        _map_bn(params, bstats, c + ("batch_norm",), state,
                f"{t}.conv_module.batch_norm")
    _map_ln(params, bstats, ("norm",), state, f"{p}norm")
    return params, bstats


def convert_post_low_energy_state_dict(state_dict: Dict, hp):
    """Reference PostLowEnergy v1/v2 mel-mel student
    (Models/postnets.py:82-217) -> (params, batch_stats, vq_stats).

    v1 (hp.version in (1, 5)): Encoder stack (Linear embed) + out head.
    v2: input projections (linear1 / linear2 when hp.phone_embed /
    linear_xvector per hp.spk_emb_postprocess_type), the optional
    EMA-VQ branch (hp.vq_code: vq_encoder_lmfb 1x1 conv + Quantize
    buffers -> the ``vq_stats`` collection), Encoder stack, out head.
    """
    state = _strip_module_prefix(state_dict)
    params: Dict = {}
    bstats: Dict = {}
    vq: Dict = {}
    if getattr(hp, "post_conformer", False):
        raise NotImplementedError(
            "post_conformer student: convert the encoder with "
            "convert_conformer_encoder_state_dict(prefix='encoder')")
    _map_encoder_stack(params, bstats, ("encoder",), state, "encoder",
                       hp.n_layer_post_model, embedding=False)
    _map_linear(params, bstats, ("out",), state, "out")
    if hp.version not in (1, 5):
        if "linear1.weight" in state:
            _map_linear(params, bstats, ("linear1",), state, "linear1")
        if "linear2.weight" in state:
            _map_linear(params, bstats, ("linear2",), state, "linear2")
        if "linear_xvector.weight" in state:
            if "linear_xvector.bias" in state:
                _map_linear(params, bstats, ("linear_xvector",), state,
                            "linear_xvector")
            else:                          # speaker_id -> nn.Embedding
                _map_embed(params, bstats, ("linear_xvector",), state,
                           "linear_xvector")
        if "vq_encoder_lmfb.weight" in state:
            _map_conv1d(params, bstats, ("vq_encoder_lmfb",), state,
                        "vq_encoder_lmfb")
            for buf in ("embed", "cluster_size", "embed_avg"):
                _set(vq, ("quantize_lmfb", buf),
                     _to_np(state[f"quantize_lmfb.{buf}"]))
    return params, bstats, vq


def convert_sq_fastspeech2_state_dict(state_dict: Dict, hp):
    """Reference SQ-VAE FastSpeech2 (Models/fastspeech2_sq.py:18-82,
    varianceadaptor_sq.py:30-128) -> (params, batch_stats).

    Transformer encoder/decoder stacks + the SQ variance adaptor
    (log_var_q_scalar, SQEmbedding codebook, duration/pitch/energy
    predictors + embeddings) + postnet or plain out head.
    """
    state = _strip_module_prefix(state_dict)
    params: Dict = {}
    bstats: Dict = {}
    if getattr(hp, "encoder_type", "transformer").lower() == "conformer" \
            or getattr(hp, "decoder_type", "transformer").lower() \
            == "conformer":
        raise NotImplementedError(
            "conformer SQ stacks: convert with "
            "convert_conformer_encoder_state_dict(prefix=...)")
    _map_encoder_stack(params, bstats, ("encoder",), state, "encoder",
                       hp.n_layer_encoder, embedding=True)
    _map_encoder_stack(params, bstats, ("decoder",), state, "decoder",
                       hp.n_layer_decoder, embedding=False)

    va = ("variance_adaptor",)
    _set(params, va + ("log_var_q_scalar",),
         _to_np(state["variance_adaptor.log_var_q_scalar"]))
    _set(params, va + ("codebook", "embedding"),
         _to_np(state["variance_adaptor.codebook.embedding"]))
    _map_variance_predictor(params, bstats, va + ("duration_predictor",),
                            state, "variance_adaptor.duration_predictor")
    if hp.pitch_pred and \
            "variance_adaptor.pitch_predictor.conv1.weight" in state:
        _map_variance_predictor(params, bstats, va + ("pitch_predictor",),
                                state, "variance_adaptor.pitch_predictor")
        _map_embed(params, bstats, va + ("pitch_embedding",), state,
                   "variance_adaptor.pitch_embedding")
    if hp.energy_pred and \
            "variance_adaptor.energy_predictor.conv1.weight" in state:
        _map_variance_predictor(params, bstats, va + ("energy_predictor",),
                                state, "variance_adaptor.energy_predictor")
        _map_embed(params, bstats, va + ("energy_embedding",), state,
                   "variance_adaptor.energy_embedding")

    if hp.postnet_pred:
        pn = ("postnet",)
        _map_linear(params, bstats, pn + ("out",), state, "postnet.out")
        _map_conv1d(params, bstats, pn + ("conv1",), state, "postnet.conv1")
        _map_conv1d(params, bstats, pn + ("conv2",), state, "postnet.conv2")
        _map_bn(params, bstats, pn + ("pre_batchnorm",), state,
                "postnet.pre_batchnorm")
        for i in range(3):
            _map_conv1d(params, bstats, pn + (f"conv_list_{i}",), state,
                        f"postnet.conv_list.{i}")
            _map_bn(params, bstats, pn + (f"batch_norm_list_{i}",), state,
                    f"postnet.batch_norm_list.{i}")
    else:
        _map_linear(params, bstats, ("out",), state, "out")
    return params, bstats
