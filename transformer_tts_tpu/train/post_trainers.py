"""Mel-to-mel post-processing trainers.

Two research lines from the reference:

* ``mel-mel`` (train_fastspeech2_dev.py): a FROZEN pretrained FastSpeech2
  teacher produces mels (no_grad forward, :140-147); a PostLowEnergy v1/v2
  student learns to refine them. Versions (:170-214):
    v1/v5 -> PostLowEnergyv1 (mel only)
    v2/v3/v7 -> PostLowEnergyv2 with variance_adaptor_output fusion
    v4/v6 -> PostLowEnergyv2 with text_dur_predicted fusion
  v3/v5/v6 are RESIDUAL (student output added to teacher mel); the rest
  REPLACE. Optional semantic masking of the student input, VQ diff loss,
  NaN-skip guard (:234-246, reproduced as a lax.cond skip).

* ``text-mel-mel`` integrate training
  (train_fastspeech2_dev_integrate_train.py): one FastSpeech2 with
  ``enable_post_model`` trained jointly; versions 3/8/9/10 residual (+
  replace branch loss for 8/9/10), optional time-weighted semantic loss
  and cosine-embedding regularizer (:183-216).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.models.fastspeech2 import FastSpeech2, semantic_mask
from transformer_tts_tpu.models.postnets import (
    PostLowEnergyv1, PostLowEnergyv2)
from transformer_tts_tpu.ops.masks import create_masks
from transformer_tts_tpu.train import losses as L
from transformer_tts_tpu.train.schedule import build_optimizer
from transformer_tts_tpu.train.trainer import (
    TrainState, _maybe_reference_init)


def build_post_model(hp: HParams):
    """Student model per hp.version (train_fastspeech2_dev.py:96-116)."""
    if hp.version in (1, 5):
        return PostLowEnergyv1(
            in_dim=hp.mel_dim, out_size=hp.mel_dim_post,
            d_model=hp.d_model_encoder, n_layers=hp.n_layer_post_model,
            heads=hp.n_head_encoder,
            ff_kernel_size=hp.ff_conv_kernel_size_post,
            concat_after=hp.concat_after_post, dropout=hp.dropout,
            use_flash=hp.use_flash_attention)
    return PostLowEnergyv2(
        in_dim=hp.mel_dim, out_size=hp.mel_dim_post,
        d_model=hp.d_model_encoder, n_layers=hp.n_layer_post_model,
        heads=hp.n_head_encoder,
        ff_kernel_size=hp.ff_conv_kernel_size_post,
        concat_after=hp.concat_after_post, dropout=hp.dropout,
        phone_embed=hp.phone_embed, concat=hp.concat,
        spk_emb_postprocess_type=hp.spk_emb_postprocess_type,
        spk_emb_dim=hp.spk_emb_dim_postprocess,
        num_speakers=hp.num_speakers, vq_code=hp.vq_code,
        post_conformer=hp.post_conformer,
        intermediate_layers_out=hp.intermediate_layers_out,
        use_flash=hp.use_flash_attention)


def init_post_state(hp: HParams, rng, teacher_model: FastSpeech2,
                    *, max_frames: int = 64):
    """Init the student params (+ optimizer)."""
    student = build_post_model(hp)
    b, t = 2, max_frames
    mel = jnp.zeros((b, t, hp.mel_dim))
    mask = jnp.ones((b, 1, t), bool)
    if hp.version in (1, 5):
        variables = student.init({"params": rng, "dropout": rng}, mel, mask,
                                 train=True)
    else:
        va = jnp.zeros((b, t, hp.d_model_encoder))
        kwargs = {}
        if hp.spk_emb_postprocess_type == "speaker_id":
            kwargs["spk_emb"] = jnp.zeros((b,), jnp.int32)
        elif hp.spk_emb_postprocess_type == "x_vector":
            kwargs["spk_emb"] = jnp.zeros((b, hp.spk_emb_dim_postprocess))
        variables = student.init({"params": rng, "dropout": rng}, mel, mask,
                                 va, train=True, **kwargs)
    tx = build_optimizer(
        hp.optimizer, hp.d_model_decoder, hp.warmup_factor, hp.warmup_step,
        hp.learning_rate, hp.clip, hp.accum_grad)
    params = _maybe_reference_init(hp, variables["params"], rng)
    return student, TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}), tx=tx)


def make_meltomel_train_step(teacher: FastSpeech2, teacher_variables,
                             student, hp: HParams, *, donate: bool = True):
    """Frozen-teacher mel-mel step (train_fastspeech2_dev.py:100-323)."""
    residual = hp.version in (3, 5, 6)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_mask, rng_drop = jax.random.split(rng)
        max_frames = batch["mel"].shape[1]
        src_mask, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2")

        # frozen teacher forward (stop_gradient == torch.no_grad here)
        t_out = teacher.apply(
            teacher_variables, batch["text"], src_mask, max_frames,
            batch["alignment"], batch.get("f0"), batch.get("energy"),
            mel_mask=mel_mask, spk_emb=batch.get("spk_emb"), train=False)
        t_out = jax.lax.stop_gradient(t_out)

        input_meltomel = (t_out.mel_post if hp.postnet_pred
                          else t_out.mel_pre)
        res_mel = input_meltomel
        phone_feature = t_out.variance_adaptor_output
        if hp.semantic_mask:
            masked_mel, masked_phone, _ = semantic_mask(
                input_meltomel,
                phone_feature if hp.semantic_mask_phone else None,
                batch["alignment"], hp.mask_probability, rng_mask)
            input_meltomel = masked_mel
            if masked_phone is not None:
                phone_feature = masked_phone
        if hp.version in (4, 6):
            phone_feature = t_out.text_dur_predicted

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "vq_stats": state.vq_stats}
            if hp.version in (1, 5):
                outputs, mutated = student.apply(
                    variables, input_meltomel, mel_mask, train=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats", "vq_stats"])
                diff = None
            else:
                (outputs, _, diff), mutated = student.apply(
                    variables, input_meltomel, mel_mask, phone_feature,
                    batch.get("spk_emb_post"), train=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats", "vq_stats"])
            if residual:
                outputs = outputs + res_mel
            target = batch["mel"][:, :, : hp.mel_dim_post]
            loss = L.l1(outputs, target)
            logs = {"loss_post": loss}
            if hp.vq_code and diff is not None:
                logs["loss_vq"] = diff
                loss = loss + diff
            logs["loss_total"] = loss
            return loss, (logs, mutated)

        (loss, (logs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # NaN-skip guard (train_fastspeech2_dev.py:234-246)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            vq_stats=mutated.get("vq_stats", state.vq_stats))
        logs["grad_norm"] = optax.global_norm(grads)
        logs["skipped_nan"] = ~finite
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_meltomel_pregen_train_step(student, hp: HParams, *,
                                    donate: bool = True):
    """Mel-mel step on a PREGENERATED teacher corpus (hp.teacher_suffix).

    The reference's actual intended workflow:
    ``generate_teacher_forcing.py:131-177`` writes the teacher-forced
    mels to disk once; ``train_fastspeech2_dev.py`` then trains the
    student from the saved corpus. The round-3 trainer re-ran the frozen
    teacher forward every step (also valid parity with
    train_fastspeech2_dev.py:140-147's on-the-fly mode) — this variant
    removes that forward from the step (~2x step throughput; the
    teacher's cost is paid once by ``cli/teacher_forcing``).

    ``batch`` carries ``teacher_mel`` (normalized, padded like ``mel``)
    and, for student versions outside (1, 5), ``teacher_phone``
    (per-frame phone features saved by ``--save_phone``).
    """
    residual = hp.version in (3, 5, 6)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_mask, rng_drop = jax.random.split(rng)
        _, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2")

        input_meltomel = batch["teacher_mel"]
        res_mel = input_meltomel
        phone_feature = batch.get("teacher_phone")
        if hp.semantic_mask:
            masked_mel, masked_phone, _ = semantic_mask(
                input_meltomel,
                phone_feature if hp.semantic_mask_phone else None,
                batch["alignment"], hp.mask_probability, rng_mask)
            input_meltomel = masked_mel
            if masked_phone is not None:
                phone_feature = masked_phone

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "vq_stats": state.vq_stats}
            if hp.version in (1, 5):
                outputs, mutated = student.apply(
                    variables, input_meltomel, mel_mask, train=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats", "vq_stats"])
                diff = None
            else:
                if phone_feature is None:
                    raise ValueError(
                        f"student version {hp.version} needs phone "
                        "features: regenerate the corpus with "
                        "cli/teacher_forcing --save_phone")
                (outputs, _, diff), mutated = student.apply(
                    variables, input_meltomel, mel_mask, phone_feature,
                    batch.get("spk_emb_post"), train=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats", "vq_stats"])
            if residual:
                outputs = outputs + res_mel
            target = batch["mel"][:, :, : hp.mel_dim_post]
            loss = L.l1(outputs, target)
            logs = {"loss_post": loss}
            if hp.vq_code and diff is not None:
                logs["loss_vq"] = diff
                loss = loss + diff
            logs["loss_total"] = loss
            return loss, (logs, mutated)

        (loss, (logs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            vq_stats=mutated.get("vq_stats", state.vq_stats))
        logs["grad_norm"] = optax.global_norm(grads)
        logs["skipped_nan"] = ~finite
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_integrate_train_step(model: FastSpeech2, hp: HParams, *,
                              donate: bool = True):
    """Joint text-mel-mel step (train_fastspeech2_dev_integrate_train.py).

    ``model`` must be built with ``enable_post_model=True``.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        max_frames = batch["mel"].shape[1]
        src_mask, mel_mask = create_masks(
            batch["pos_text"], batch["pos_mel"], model="fastspeech2")

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "vq_stats": state.vq_stats}
            out, mutated = model.apply(
                variables, batch["text"], src_mask, max_frames,
                batch["alignment"], batch.get("f0"), batch.get("energy"),
                mel_mask=mel_mask, spk_emb=batch.get("spk_emb"),
                spk_emb_post=batch.get("spk_emb_post"), train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats", "vq_stats"])
            mel = batch["mel"]
            target80 = mel[:, :, : hp.mel_dim_post]
            logs = {}
            mel_loss = L.l1(out.mel_pre, mel)
            logs["loss_frame_before"] = mel_loss
            total = mel_loss
            if out.mel_post is not None:
                post_mel_loss = L.l1(out.mel_post, target80)
                logs["loss_frame_after"] = post_mel_loss
                total = total + post_mel_loss

            # residual / replace wiring (:183-206)
            if out.mel_post is not None:
                res_outputs = out.post_output + out.mel_post
            elif hp.version == 3:
                res_outputs = out.post_output + out.mel_pre
            elif hp.version in (8, 9, 10):
                post_res, post_replace = out.post_output
                res_outputs = post_res + out.mel_pre
                if hp.semantic_mask and hp.time_weight is not None \
                        and out.mask_frames is not None:
                    rep_loss = L.time_weighted_l1(
                        post_replace, target80, out.mask_frames,
                        hp.time_weight, hp.mel_dim)
                else:
                    rep_loss = L.l1(post_replace, target80)
                logs["replace_loss"] = rep_loss
                total = total + rep_loss
            else:
                res_outputs = out.post_output
            post_pro_loss = L.l1(res_outputs, target80)
            logs["loss_post_pro"] = post_pro_loss
            total = total + post_pro_loss

            if hp.use_cosine_emb_loss:
                emb_loss = L.cosine_embedding_loss(out.mel_pre, res_outputs)
                logs["loss_cosine_emb"] = emb_loss
                total = total + 0.2 * emb_loss

            d_loss = L.duration_loss(out.log_duration, batch["alignment"],
                                     None, hp.log_offset)
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
