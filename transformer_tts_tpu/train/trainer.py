"""Train state and jitted/pjit train steps.

Replaces the reference's per-step Python hot loop
(train_fastspeech2.py:100-323) with a single compiled XLA program per
(bucket-shape) signature:

* forward + loss + backward + clip + optimizer update in one ``jit``;
* bf16 compute policy when ``hp.amp`` (no GradScaler — bf16 has fp32 range;
  documented behavioral delta vs torch.cuda.amp, SURVEY.md §2.7);
* under a data mesh the gradient all-reduce is an XLA ICI collective
  inserted by the compiler (the DDP backward hook equivalent);
* BatchNorm batch statistics are computed on the global batch (SyncBN
  equivalent, see parallel/mesh.py).

The Noam LR lives inside the optimizer (train/schedule.py); the SQ-VAE
temperature anneal ``1.0*exp(-1e-5*step)`` (train_fastspeech2_sq.py:136-140)
is computed from ``state.step`` inside the step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.models.fastspeech2 import FastSpeech2
from transformer_tts_tpu.models.transformer_tts import (
    TransformerTTS, build_transformer_tts)
from transformer_tts_tpu.ops.masks import create_masks
from transformer_tts_tpu.train import losses as L
from transformer_tts_tpu.train.schedule import (
    apply_reference_init, build_optimizer)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    vq_stats: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def build_fastspeech2(hp: HParams, *, train_dtype=None,
                      enable_post_model: bool = False) -> FastSpeech2:
    """Instantiate FastSpeech2 from the hparams contract (SURVEY.md §2.1)."""
    dtype = train_dtype if train_dtype is not None else (
        jnp.bfloat16 if hp.amp else jnp.float32)
    spk_arch = tuple(
        s for s in ("encoder", "middle", "decoder")
        if s in (hp.spk_emb_architecture or ""))
    post_cfg = None
    if enable_post_model:
        # tuple-of-pairs, not dict: the module must stay hashable so it
        # can ride as a static arg of the jitted synthesize fns
        post_cfg = dict(
            out_size=hp.mel_dim_post, d_model=hp.d_model_encoder,
            n_layers=hp.n_layer_post_model, heads=hp.n_head_encoder,
            ff_kernel_size=hp.ff_conv_kernel_size_post,
            concat_after=hp.concat_after_post, dropout=hp.dropout,
            phone_embed=hp.phone_embed, concat=hp.concat,
            spk_emb_postprocess_type=hp.spk_emb_postprocess_type,
            spk_emb_dim=hp.spk_emb_dim_postprocess,
            num_speakers=hp.num_speakers, vq_code=hp.vq_code,
            post_conformer=hp.post_conformer,
            use_flash=hp.use_flash_attention,
            intermediate_layers_out=(
                tuple(hp.intermediate_layers_out)
                if hp.intermediate_layers_out else None))
        post_cfg = tuple(sorted(post_cfg.items()))
    return FastSpeech2(
        vocab_size=hp.vocab_size, mel_dim=hp.mel_dim,
        d_model_encoder=hp.d_model_encoder,
        n_layer_encoder=hp.n_layer_encoder,
        n_head_encoder=hp.n_head_encoder,
        ff_conv_kernel_size_encoder=hp.ff_conv_kernel_size_encoder,
        concat_after_encoder=hp.concat_after_encoder,
        d_model_decoder=hp.d_model_decoder,
        n_layer_decoder=hp.n_layer_decoder,
        n_head_decoder=hp.n_head_decoder,
        ff_conv_kernel_size_decoder=hp.ff_conv_kernel_size_decoder,
        concat_after_decoder=hp.concat_after_decoder,
        encoder_type=hp.encoder_type, decoder_type=hp.decoder_type,
        reduction_rate=1 if hp.model.lower() == "fastspeech2" else
        hp.reduction_rate,
        postnet_pred=hp.postnet_pred, dropout=hp.dropout,
        dropout_postnet=hp.dropout_postnet,
        dropout_variance_adaptor=hp.dropout_variance_adaptor,
        n_bins=hp.nbins, f0_min=hp.f0_min, f0_max=hp.f0_max,
        energy_min=hp.energy_min, energy_max=hp.energy_max,
        log_offset=hp.log_offset, pitch_pred=hp.pitch_pred,
        energy_pred=hp.energy_pred,
        f0_stats=_variance_stats(hp.f0_mean, hp.f0_std),
        energy_stats=_variance_stats(hp.energy_mean, hp.energy_std),
        use_pos=hp.use_pos,
        use_rnn_length=hp.use_rnn_length,
        p_scheduled_sampling=hp.p_scheduled_sampling,
        accent_emb=hp.accent_emb,
        multi_speaker=hp.is_multi_speaker, spk_emb_dim=hp.spk_emb_dim,
        spk_emb_architecture=spk_arch, use_hop=hp.use_hop,
        use_sq_vae=hp.use_sq_vae,
        enable_post_model=enable_post_model, post_model_cfg=post_cfg,
        version=hp.version, semantic_mask=hp.semantic_mask,
        semantic_mask_phone=hp.semantic_mask_phone,
        mask_probability=hp.mask_probability,
        use_flash=hp.use_flash_attention,
        ctc_training=hp.CTC_training,
        dtype=dtype)


def init_fastspeech2_state(
    hp: HParams, rng: jax.Array, *,
    max_text: int = 32, max_frames: int = 128,
    enable_post_model: bool = False,
) -> Tuple[FastSpeech2, TrainState]:
    """Initialize params with tiny dummy shapes (shapes don't matter for
    param structure — all ops are length-agnostic)."""
    model = build_fastspeech2(hp, enable_post_model=enable_post_model)
    b = 2
    text = jnp.ones((b, max_text), jnp.int32)
    pos_text = jnp.tile(jnp.arange(1, max_text + 1)[None], (b, 1))
    src_mask, _ = create_masks(pos_text, None)
    d_target = jnp.full((b, max_text), max(1, max_frames // max_text),
                        jnp.int32)
    p_target = jnp.zeros((b, max_frames))
    e_target = jnp.zeros((b, max_frames))
    kwargs = {}
    if hp.is_multi_speaker:
        kwargs["spk_emb"] = (
            jnp.zeros((b,), jnp.int32)
            if hp.spk_emb_type == "speaker_id"
            else jnp.zeros((b, hp.spk_emb_dim)))
    if hp.accent_emb:
        kwargs["accent"] = jnp.zeros((b, max_text), jnp.int32)
    if hp.use_hop:
        kwargs["hop_size"] = jnp.zeros((b,), jnp.int32)
    if hp.use_sq_vae:
        kwargs["temperature"] = jnp.asarray(1.0)
    variables = model.init(
        {"params": rng, "dropout": rng}, text, src_mask, max_frames,
        d_target, p_target, e_target, train=True, **kwargs)
    tx = build_optimizer(
        hp.optimizer, hp.d_model_decoder, hp.warmup_factor, hp.warmup_step,
        hp.learning_rate, hp.clip, hp.accum_grad)
    params = _maybe_reference_init(hp, variables["params"], rng)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}), tx=tx)
    return model, state


def _maybe_reference_init(hp: HParams, params, rng):
    """Apply the reference's init_weight scheme when hp.reference_init.

    Every reference driver calls ``model.apply(init_weight)`` after
    construction (train.py:103, train_fastspeech2.py:399,
    train_fastspeech2_dev.py:~110); this is the jax-side equivalent,
    applied in every init path so training dynamics match by default.
    """
    if getattr(hp, "reference_init", True):
        return apply_reference_init(params, jax.random.fold_in(rng, 0x17))
    return params


def _variance_stats(mean, std):
    """(mean, std) tuple when both set, else None (reference raw units).
    See config.py f0_mean/f0_std — the opt-in standardized-predictor
    mode."""
    return (float(mean), float(std)) \
        if (mean is not None and std is not None) else None


def make_fastspeech2_train_step(model: FastSpeech2, hp: HParams,
                                *, donate: bool = True):
    """Build the jitted FS2 train step.

    ``batch``: dict with keys text, pos_text, mel, pos_mel, alignment,
    f0, energy and optional spk_emb / accent / hop_size. All arrays are
    padded to static bucket shapes by the data layer.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        max_frames = batch["mel"].shape[1]
        src_mask, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2",
            fix_mask=hp.fix_mask)
        temperature = (jnp.exp(-1e-5 * state.step.astype(jnp.float32))
                       if hp.use_sq_vae else None)

        def forward(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "vq_stats": state.vq_stats}
            return model.apply(
                variables, batch["text"], src_mask, max_frames,
                batch["alignment"], batch.get("f0"), batch.get("energy"),
                mel_mask=mel_mask,
                accent=batch.get("accent"), spk_emb=batch.get("spk_emb"),
                spk_emb_post=batch.get("spk_emb_post"),
                hop_size=batch.get("hop_size"), temperature=temperature,
                train=True, rngs={"dropout": rng},
                mutable=["batch_stats", "vq_stats"])

        if hp.remat:
            # whole-forward rematerialization: trade ~1/3 more FLOPs for
            # activation memory (long buckets / large batches)
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            out, mutated = forward(params)
            total, logs = L.fastspeech2_loss(
                out, batch["mel"], batch["alignment"],
                batch.get("f0"), batch.get("energy"),
                src_mask=src_mask, mel_mask=mel_mask,
                masked=False, use_ssim=hp.use_ssim,
                use_sq_vae=hp.use_sq_vae, log_offset=hp.log_offset,
                channel_wise=hp.channel_wise,
                channel_weight=hp.channel_weight,
                output_type=hp.output_type,
                f0_stats=_variance_stats(hp.f0_mean, hp.f0_std),
                energy_stats=_variance_stats(hp.energy_mean,
                                             hp.energy_std))
            if hp.CTC_training:
                # mid-decoder tap CTC'd against the text ids, weight 0.2,
                # blank 0 (train_Fastspeech2.py:168,220-224); input
                # lengths are mel lengths, label lengths text lengths
                loss_ctc = L.ctc_aux_loss(
                    out.ctc_logits,
                    1.0 - mel_mask[:, 0, :].astype(jnp.float32),
                    batch["text"],
                    (batch["text"] == 0).astype(jnp.float32))
                logs["loss_ctc"] = loss_ctc
                total = total + 0.2 * loss_ctc
                logs["loss_total"] = total
            return total, (logs, mutated)

        (loss, (logs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            vq_stats=mutated.get("vq_stats", state.vq_stats))
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_fastspeech2_eval_step(model: FastSpeech2, hp: HParams):
    """Jitted teacher-forced forward for dev loss / teacher-forcing gen."""

    def eval_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        max_frames = batch["mel"].shape[1]
        src_mask, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "vq_stats": state.vq_stats}
        out = model.apply(
            variables, batch["text"], src_mask, max_frames,
            batch["alignment"], batch.get("f0"), batch.get("energy"),
            mel_mask=mel_mask, accent=batch.get("accent"),
            spk_emb=batch.get("spk_emb"), hop_size=batch.get("hop_size"),
            train=False)
        total, logs = L.fastspeech2_loss(
            out, batch["mel"], batch["alignment"], batch.get("f0"),
            batch.get("energy"), src_mask=src_mask, mel_mask=mel_mask,
            masked=False, log_offset=hp.log_offset,
            f0_stats=_variance_stats(hp.f0_mean, hp.f0_std),
            energy_stats=_variance_stats(hp.energy_mean, hp.energy_std))
        return out, logs

    return jax.jit(eval_fn)


# --------------------------------------------------------------------------
# AR Transformer-TTS
# --------------------------------------------------------------------------

def init_transformer_state(hp: HParams, rng: jax.Array, *,
                           max_text: int = 32,
                           max_frames: int = 64) -> Tuple[TransformerTTS,
                                                          TrainState]:
    model = build_transformer_tts(hp)
    b, r = 2, hp.reduction_rate
    src = jnp.ones((b, max_text), jnp.int32)
    pos_text = jnp.tile(jnp.arange(1, max_text + 1)[None], (b, 1))
    if hp.decoder_type.lower() == "tacotron2":
        # full-rate teacher target (multiple of r)
        trg = jnp.zeros((b, max_frames - r, hp.mel_dim))
        src_mask, trg_mask = create_masks(pos_text, None,
                                          model="transformer")
    else:
        t = max_frames // r - 1
        trg = jnp.zeros((b, t, hp.mel_dim))
        pos_mel = jnp.tile(jnp.arange(1, t + 1)[None], (b, 1))
        src_mask, trg_mask = create_masks(pos_text, pos_mel,
                                          model="transformer")
    kwargs = {}
    if hp.is_multi_speaker:
        kwargs["spk_emb"] = (
            jnp.zeros((b,), jnp.int32) if hp.spk_emb_type == "speaker_id"
            else jnp.zeros((b, hp.spk_emb_dim)))
    variables = model.init({"params": rng, "dropout": rng}, src, trg,
                           src_mask, trg_mask, train=True, **kwargs)
    tx = build_optimizer(
        hp.optimizer, hp.d_model_decoder, hp.warmup_factor, hp.warmup_step,
        hp.learning_rate, hp.clip, hp.accum_grad)
    params = _maybe_reference_init(hp, variables["params"], rng)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}), tx=tx)
    return model, state


def _guided_attention_loss(attn, text_len, query_len, sigma):
    """Diagonal attention prior (Tachibana et al. 2017 §3.3).

    ``attn``: (B, layers, H, T_q, L) stacked cross-attention (averaged
    over layers/heads — by linearity this equals the per-head penalty up
    to a constant) or (B, T_q, L). Penalty per valid (t, l):
    ``A[t, l] * (1 - exp(-((l/L - t/T)^2) / (2 sigma^2)))`` — mass far
    from the t/T ~ l/L diagonal is taxed, localized monotonic attention
    is nearly free.
    """
    a = attn.astype(jnp.float32)
    if a.ndim == 5:
        a = a.mean(axis=(1, 2))
    t_q, l = a.shape[-2], a.shape[-1]
    t_idx = (jnp.arange(t_q) + 1.0)[None, :, None]
    l_idx = (jnp.arange(l) + 1.0)[None, None, :]
    ql = jnp.maximum(query_len.astype(jnp.float32), 1.0)[:, None, None]
    tl = jnp.maximum(text_len.astype(jnp.float32), 1.0)[:, None, None]
    w = 1.0 - jnp.exp(-((l_idx / tl - t_idx / ql) ** 2)
                      / (2.0 * sigma ** 2))
    valid = (t_idx <= ql) & (l_idx <= tl)
    return (jnp.sum(a * w * valid)
            / jnp.maximum(jnp.sum(valid), 1.0))


def make_transformer_train_step(model: TransformerTTS, hp: HParams,
                                *, donate: bool = True):
    """AR teacher-forcing train step (train.py:156-267).

    ``batch``: text, pos_text, mel (B, T, mel) with the go-frame prepended
    and T a multiple of r (data layer contract), pos_mel, stop_token
    (B, T) with 1.0 beyond mel_length.

    ``hp.guided_attention_weight > 0`` adds the diagonal attention prior
    on the cross-attention maps (beyond-parity opt-in — see config.py).
    """
    r = model.reduction_rate
    ga_w = float(hp.guided_attention_weight or 0.0)
    ga_sigma = float(hp.guided_attention_sigma)

    is_taco = model.decoder_type.lower() == "tacotron2"

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        mel = batch["mel"]
        b, total_frames, mel_dim = mel.shape
        if is_taco:
            # tacotron2 decoder is teacher-forced on the FULL-RATE target
            # (Models/decoder.py:104-207); same loss targets mel[:, r:]
            mel_input = mel[:, r:, :]
            src_mask, trg_mask = create_masks(
                batch["pos_text"], None, model="transformer")
        elif r > 1:
            mel_input = mel[:, :-r:r, :]              # train.py:186
            pos_mel = batch["pos_mel"][:, :-r:r]
            src_mask, trg_mask = create_masks(
                batch["pos_text"], pos_mel, model="transformer")
        else:
            mel_input = mel[:, :-1, :]
            pos_mel = batch["pos_mel"][:, :-1]
            src_mask, trg_mask = create_masks(
                batch["pos_text"], pos_mel, model="transformer")

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables, batch["text"], mel_input, src_mask, trg_mask,
                batch.get("spk_emb"), train=True, rngs={"dropout": rng},
                collect_attn=ga_w > 0, mutable=["batch_stats"])
            t = out.mel_pre.shape[1]
            mel_pre = out.mel_pre.reshape(b, t * r, mel_dim)
            mel_post = out.mel_post.reshape(b, t * r, mel_dim)
            stop = out.stop_token.reshape(b, t * r)
            total, logs = L.transformer_tts_loss(
                mel_pre, mel_post, stop,
                mel[:, r:, :], batch["stop_token"][:, r:],
                positive_weight=hp.positive_weight)
            if ga_w > 0:
                q_len = (batch["pos_mel"] != 0).sum(axis=1) // r
                t_len = (batch["pos_text"] != 0).sum(axis=1)
                ga = _guided_attention_loss(out.attn_dec_enc, t_len,
                                            q_len, ga_sigma)
                logs["loss_guided_attention"] = ga
                total = total + ga_w * ga
                logs["loss_total"] = total
            return total, (logs, mutated)

        (loss, (logs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats))
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# --------------------------------------------------------------------------
# SQ-VAE FastSpeech2 (unsupervised duration, train_fastspeech2_sq.py)
# --------------------------------------------------------------------------

def build_sq_fastspeech2(hp: HParams):
    from transformer_tts_tpu.models.fastspeech2_sq import SQFastSpeech2
    dtype = jnp.bfloat16 if hp.amp else jnp.float32
    spk_arch = tuple(
        s for s in ("encoder", "middle", "decoder")
        if s in (hp.spk_emb_architecture or ""))
    return SQFastSpeech2(
        vocab_size=hp.vocab_size, mel_dim=hp.mel_dim,
        d_model_encoder=hp.d_model_encoder,
        n_layer_encoder=hp.n_layer_encoder,
        n_head_encoder=hp.n_head_encoder,
        ff_conv_kernel_size_encoder=hp.ff_conv_kernel_size_encoder,
        concat_after_encoder=hp.concat_after_encoder,
        d_model_decoder=hp.d_model_decoder,
        n_layer_decoder=hp.n_layer_decoder,
        n_head_decoder=hp.n_head_decoder,
        ff_conv_kernel_size_decoder=hp.ff_conv_kernel_size_decoder,
        concat_after_decoder=hp.concat_after_decoder,
        encoder_type=hp.encoder_type, decoder_type=hp.decoder_type,
        postnet_pred=hp.postnet_pred, dropout=hp.dropout,
        dropout_postnet=hp.dropout_postnet,
        dropout_variance_adaptor=hp.dropout_variance_adaptor,
        n_bins=hp.nbins, f0_min=hp.f0_min, f0_max=hp.f0_max,
        energy_min=hp.energy_min, energy_max=hp.energy_max,
        log_offset=hp.log_offset, pitch_pred=hp.pitch_pred,
        energy_pred=hp.energy_pred, accent_emb=hp.accent_emb,
        multi_speaker=hp.is_multi_speaker, spk_emb_dim=hp.spk_emb_dim,
        spk_emb_architecture=spk_arch,
        use_flash=hp.use_flash_attention, dtype=dtype)


def init_sq_fastspeech2_state(hp: HParams, rng: jax.Array, *,
                              max_text: int = 32, max_frames: int = 128):
    model = build_sq_fastspeech2(hp)
    b = 2
    text = jnp.ones((b, max_text), jnp.int32)
    pos_text = jnp.tile(jnp.arange(1, max_text + 1)[None], (b, 1))
    src_mask, _ = create_masks(pos_text, None)
    p_target = jnp.zeros((b, max_frames))
    e_target = jnp.zeros((b, max_frames))
    variables = model.init(
        {"params": rng, "dropout": rng}, text, src_mask, max_frames,
        None, p_target, e_target, temperature=jnp.asarray(1.0), train=True)
    tx = build_optimizer(
        hp.optimizer, hp.d_model_decoder, hp.warmup_factor, hp.warmup_step,
        hp.learning_rate, hp.clip, hp.accum_grad)
    params = _maybe_reference_init(hp, variables["params"], rng)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}), tx=tx)
    return model, state


def make_sq_fastspeech2_train_step(model, hp: HParams, *,
                                   donate: bool = True):
    """SQ-VAE trainer (train_fastspeech2_sq.py:95-230).

    Duration target forced None (:122); duration supervision is
    ``mean_b |sum_l exp(logd)_valid - mel_len_b|`` (:203-208); mel loss is
    the AR-ELBO MSE; SQ-VAE loss added; temperature ``exp(-1e-5 step)``.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        max_frames = batch["mel"].shape[1]
        src_mask, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2")
        temperature = jnp.exp(-1e-5 * state.step.astype(jnp.float32))

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "vq_stats": state.vq_stats}
            out, mutated = model.apply(
                variables, batch["text"], src_mask, max_frames,
                None, batch.get("f0"), batch.get("energy"),
                mel_mask=mel_mask, accent=batch.get("accent"),
                spk_emb=batch.get("spk_emb"), temperature=temperature,
                train=True, rngs={"dropout": rng},
                mutable=["batch_stats", "vq_stats"])
            logs = {}
            mel_loss = L.mse_loss_arelbo(out.mel_pre, batch["mel"])
            logs["loss_frame_before"] = mel_loss
            total = mel_loss
            if out.mel_post is not None:
                post_loss = L.l1(out.mel_post, batch["mel"])
                logs["loss_frame_after"] = post_loss
                total = total + post_loss
            # unsupervised duration: total predicted frames vs mel length
            valid = src_mask[:, 0, :]
            pred_frames = jnp.sum(
                jnp.exp(out.log_duration.astype(jnp.float32)) * valid,
                axis=1)
            mel_lengths = jnp.sum(mel_mask[:, 0, :], axis=1).astype(
                jnp.float32)
            d_loss = jnp.mean(jnp.abs(pred_frames - mel_lengths))
            logs["loss_duration"] = d_loss
            total = total + d_loss
            if out.pitch is not None and batch.get("f0") is not None:
                f0_loss = L.l1(out.pitch, batch["f0"])
                logs["loss_f0"] = f0_loss
                total = total + f0_loss
            if out.energy is not None and batch.get("energy") is not None:
                e_loss = L.l1(out.energy, batch["energy"])
                logs["loss_energy"] = e_loss
                total = total + e_loss
            total = total + out.sq_vae_loss
            logs["sq_vae_loss"] = out.sq_vae_loss
            logs["sq_vae_perplexity"] = out.sq_vae_perplexity
            logs["loss_total"] = total
            return total, (logs, mutated)

        (loss, (logs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            vq_stats=mutated.get("vq_stats", state.vq_stats))
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
