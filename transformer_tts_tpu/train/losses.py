"""Loss functions.

Reference losses (train_fastspeech2.py:181-302, train.py:213-219):

* FastSpeech2: L1(mel_pre, mel) + L1(mel_post, mel) + L1(logd, log(d+1))
  + L1(f0) + L1(energy), optionally -SSIM(post, mel), SQ-VAE ELBO, or the
  mse_loss_arelbo variant.
* AR Transformer: L1(pre) + L1(post) + BCEWithLogits(stop, pos_weight=5).

The reference averages L1 over the FULL padded tensor (plain nn.L1Loss()
on padded batches) — padding influences the loss scale. We keep a
``masked`` switch: ``False`` replicates the reference exactly; ``True``
averages over valid positions only (recommended; documented delta).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l1(pred: jnp.ndarray, target: jnp.ndarray,
       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean absolute error; optional bool mask (True = count)."""
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is None:
        return err.mean()
    mask = jnp.broadcast_to(mask, err.shape).astype(jnp.float32)
    return (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def channel_wise_l1(pred: jnp.ndarray, target: jnp.ndarray,
                    channel_weight, split: int = 20) -> jnp.ndarray:
    """Split-band weighted L1 (reference loss_mel channel_wise,
    train_fastspeech2.py:90-98: channels [0:20) and [20:) weighted)."""
    w0, w1 = channel_weight
    return (w0 * l1(pred[:, :, :split], target[:, :, :split])
            + w1 * l1(pred[:, :, split:], target[:, :, split:]))


def duration_loss(log_d_pred: jnp.ndarray, d_target: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None,
                  log_offset: float = 1.0) -> jnp.ndarray:
    """L1(logd_pred, log(d_target + log_offset)) (train_fastspeech2.py:245)."""
    target = jnp.log(d_target.astype(jnp.float32) + log_offset)
    return l1(log_d_pred, target, mask)


def stop_token_loss(logits: jnp.ndarray, target: jnp.ndarray,
                    pos_weight: float = 5.0,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCEWithLogits with positive-class weight (train.py:213-219).

    target: 1.0 at stop frames (and padding, per the reference collate
    which pads stop tokens with 1.0 — datasets_fastspeech2.py:741-747).
    """
    x = logits.astype(jnp.float32)
    z = target.astype(jnp.float32)
    # log(1+exp(-|x|)) stable form of BCE-with-logits with pos_weight
    log_sig = jnp.logaddexp(0.0, -x)      # -log(sigmoid(x))
    log_one_minus = jnp.logaddexp(0.0, x)  # -log(1-sigmoid(x))
    per = pos_weight * z * log_sig + (1.0 - z) * log_one_minus
    if mask is None:
        return per.mean()
    mask = jnp.broadcast_to(mask, per.shape).astype(jnp.float32)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def ctc_aux_loss(logits: jnp.ndarray, logit_paddings: jnp.ndarray,
                 labels: jnp.ndarray, label_paddings: jnp.ndarray,
                 blank_id: int = 0) -> jnp.ndarray:
    """CTC auxiliary loss (train_Fastspeech2.py:220-224).

    torch ``F.ctc_loss(..., blank=0)`` semantics with the default
    ``reduction='mean'``: each utterance's negative log-likelihood is
    divided by its LABEL length, then batch-averaged. ``logits``:
    (B, T, K) raw (log-softmax applied internally, like the reference's
    explicit ``F.log_softmax``); paddings are 1.0 at padded positions.
    """
    import optax
    per = optax.ctc_loss(logits.astype(jnp.float32), logit_paddings,
                         labels, label_paddings, blank_id=blank_id)
    lab_len = jnp.maximum((1.0 - label_paddings).sum(-1), 1.0)
    return (per / lab_len).mean()


def mse_loss_arelbo(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """AR-ELBO surrogate (train_fastspeech2.py:85-88, arXiv:2102.08663)."""
    n = target.size // target.shape[0]
    return 0.5 * n * jnp.log(jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = None,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Structural similarity on (B, H, W) images.

    Replaces torchmetrics' StructuralSimilarityIndexMeasure used at
    train_fastspeech2.py:289-292 (gaussian-window SSIM, k1=.01, k2=.03).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(x.max() - x.min(), y.max() - y.min())
    win = _gaussian_window(window_size, sigma)
    kernel = jnp.outer(win, win)[None, None]  # (1,1,K,K) OIHW

    def filt(img):
        img = img[:, None]  # (B,1,H,W)
        return jax.lax.conv_general_dilated(
            img, kernel, window_strides=(1, 1), padding="VALID")[:, 0]

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x ** 2
    syy = filt(y * y) - mu_y ** 2
    sxy = filt(x * y) - mu_x * mu_y
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return (num / den).mean()


def fastspeech2_loss(
    out,
    mel: jnp.ndarray,
    d_target: jnp.ndarray,
    f0: Optional[jnp.ndarray],
    energy: Optional[jnp.ndarray],
    *,
    src_mask: Optional[jnp.ndarray] = None,
    mel_mask: Optional[jnp.ndarray] = None,
    masked: bool = False,
    use_ssim: bool = False,
    use_sq_vae: bool = False,
    log_offset: float = 1.0,
    channel_wise: bool = False,
    channel_weight=None,
    output_type=None,
    f0_stats=None,
    energy_stats=None,
):
    """Total FastSpeech2 loss + component dict (train_fastspeech2.py:197-302).

    ``out`` is a FastSpeech2Output. With ``masked=False`` (default) the
    averages run over padded positions too, exactly like the reference's
    plain ``nn.L1Loss()`` calls.

    ``output_type='softmax'``: discrete dual-stream mode
    (train_fastspeech2.py:182-195) — mel losses become cross-entropy on
    (B, T, 2) int targets (pad = ignore_index 320), with accuracy logs
    from the postnet logits; duration/f0/energy losses apply as usual
    (:244-260 adds them regardless of output mode).

    ``f0_stats`` / ``energy_stats``: optional (mean, std). When set, the
    predictor works in standardized units (VarianceAdaptor.f0_stats) and
    the targets are standardized here before the L1 — the opt-in
    loss-balance mode (config.py f0_mean/f0_std).
    """
    fmask = mel_mask[:, 0, :, None] if (masked and mel_mask is not None) \
        else None
    vmask = mel_mask[:, 0, :] if (masked and mel_mask is not None) else None
    smask = src_mask[:, 0, :] if (masked and src_mask is not None) else None
    # Standardized mode MUST mask its L1 over valid frames: the raw-unit
    # targets pad with 0, which standardizes to the constant -mean/std at
    # every padded position — with frame buckets much longer than the
    # utterances, that constant dominates the unmasked average and the
    # loss plateaus at ~|mean|/std regardless of predictor quality
    # (measured: loss_energy stuck at 2.1 for 4000 steps on the
    # full-pipeline corpus). The unmasked average is reference parity
    # only for raw units, where pad target 0 ~= the predictor's natural
    # output on padded input.
    f0_vmask, energy_vmask = vmask, vmask
    if f0 is not None and f0_stats is not None:
        f0 = (f0 - f0_stats[0]) / f0_stats[1]
        if mel_mask is not None:
            f0_vmask = mel_mask[:, 0, :]
            f0 = jnp.where(f0_vmask, f0, 0.0)
    if energy is not None and energy_stats is not None:
        energy = (energy - energy_stats[0]) / energy_stats[1]
        if mel_mask is not None:
            energy_vmask = mel_mask[:, 0, :]
            energy = jnp.where(energy_vmask, energy, 0.0)

    logs = {}
    if output_type == "softmax":
        num_classes = out.mel_pre.shape[-1] // 2
        mel_loss, _ = softmax_output_loss(out.mel_pre, mel, num_classes)
        logs["loss_frame_before"] = mel_loss
        total = mel_loss
        if out.mel_post is not None:
            post_loss, acc = softmax_output_loss(out.mel_post, mel,
                                                 num_classes)
            logs["loss_frame_after"] = post_loss
            logs.update(acc)         # accuracy_1/2 (:190-194 prints)
            total = total + post_loss
        d_loss = duration_loss(out.log_duration, d_target, smask,
                               log_offset)
        logs["loss_duration"] = d_loss
        total = total + d_loss
        if out.pitch is not None and f0 is not None:
            f0_loss = l1(out.pitch, f0, f0_vmask)
            logs["loss_f0"] = f0_loss
            total = total + f0_loss
        if out.energy is not None and energy is not None:
            e_loss = l1(out.energy, energy, energy_vmask)
            logs["loss_energy"] = e_loss
            total = total + e_loss
        logs["loss_total"] = total
        return total, logs

    if channel_wise:
        cw = channel_weight if channel_weight is not None else (1.0, 1.0)
        mel_loss = channel_wise_l1(out.mel_pre, mel, cw)
    elif use_sq_vae:
        mel_loss = mse_loss_arelbo(out.mel_pre, mel)
    else:
        mel_loss = l1(out.mel_pre, mel, fmask)
    logs["loss_frame_before"] = mel_loss
    total = mel_loss
    if out.mel_post is not None:
        if channel_wise:
            post_loss = channel_wise_l1(out.mel_post, mel, cw)
        else:
            post_loss = l1(out.mel_post, mel, fmask)
        logs["loss_frame_after"] = post_loss
        total = total + post_loss

    d_loss = duration_loss(out.log_duration, d_target, smask, log_offset)
    logs["loss_duration"] = d_loss
    total = total + d_loss

    if out.pitch is not None and f0 is not None:
        f0_loss = l1(out.pitch, f0, f0_vmask)
        logs["loss_f0"] = f0_loss
        total = total + f0_loss
    if out.energy is not None and energy is not None:
        e_loss = l1(out.energy, energy, energy_vmask)
        logs["loss_energy"] = e_loss
        total = total + e_loss

    if use_ssim and out.mel_post is not None:
        s = -ssim(out.mel_post, mel)
        logs["loss_ssim"] = s
        total = total + s

    if out.sq_vae_loss is not None:
        logs["sq_vae_loss"] = out.sq_vae_loss
        logs["sq_vae_perplexity"] = out.sq_vae_perplexity
        total = total + out.sq_vae_loss

    logs["loss_total"] = total
    return total, logs


def transformer_tts_loss(
    mel_pre: jnp.ndarray,
    mel_post: jnp.ndarray,
    stop_logits: jnp.ndarray,
    mel_target: jnp.ndarray,
    stop_target: jnp.ndarray,
    *,
    positive_weight: float = 5.0,
    mask: Optional[jnp.ndarray] = None,
):
    """L1(pre) + L1(post) + weighted stop BCE (train.py:213-219)."""
    fmask = mask[..., None] if mask is not None else None
    pre = l1(mel_pre, mel_target, fmask)
    post = l1(mel_post, mel_target, fmask)
    stop = stop_token_loss(stop_logits, stop_target, positive_weight, mask)
    total = pre + post + stop
    return total, {"loss_frame_before": pre, "loss_frame_after": post,
                   "loss_token": stop, "loss_total": total}


def time_weighted_l1(pred: jnp.ndarray, target: jnp.ndarray,
                     time_mask: jnp.ndarray, time_weight,
                     mel_dim: int) -> jnp.ndarray:
    """Semantic-mask time-weighted L1 (integrate trainer loss_mel,
    train_fastspeech2_dev_integrate_train.py:67-79).

    ``time_mask``: (B, T, 1) bool — True inside masked phone spans.
    loss = w0 * mean_over_masked + w1 * mean_over_unmasked.
    """
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = time_mask.astype(jnp.float32)
    loss_mask = (err * m).sum() / jnp.maximum(m.sum(), 1.0) / mel_dim
    inv = 1.0 - m
    loss_unmask = (err * inv).sum() / jnp.maximum(inv.sum(), 1.0) / mel_dim
    return time_weight[0] * loss_mask + time_weight[1] * loss_unmask


def cosine_embedding_loss(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """F.cosine_embedding_loss with target=+1: mean(1 - cos(x1, x2))
    over flattened samples (integrate trainer :208-216)."""
    a = x1.reshape(x1.shape[0], -1).astype(jnp.float32)
    b = x2.reshape(x2.shape[0], -1).astype(jnp.float32)
    num = (a * b).sum(-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    cos = num / jnp.maximum(den, 1e-8)
    return jnp.mean(1.0 - cos)


def softmax_output_loss(pred: jnp.ndarray, targets: jnp.ndarray,
                        num_classes: int, ignore_index: int = 320):
    """Discrete dual-stream output loss (train_fastspeech2.py:182-195).

    ``pred``: (B, T, 2*num_classes) logits, first/second half per stream;
    ``targets``: (B, T, 2) int codes, ``ignore_index`` = padding.
    Returns (loss, {accuracy_1, accuracy_2}).

    NOTE: the reference's wiring of this mode is internally inconsistent
    (the output head is Linear(d, mel_dim) yet the loss slices
    [:, :, mel_dim:] — an empty tensor unless mel_dim is set to
    2*num_classes); this implementation defines the working contract.
    """
    logits1 = pred[:, :, :num_classes].astype(jnp.float32)
    logits2 = pred[:, :, num_classes:].astype(jnp.float32)
    t1 = targets[:, :, 0]
    t2 = targets[:, :, 1]

    def ce(logits, t):
        valid = (t != ignore_index)
        t_safe = jnp.where(valid, t, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, t_safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        n = jnp.maximum(valid.sum(), 1)
        acc = (jnp.where(valid, logits.argmax(-1) == t, False).sum()
               / n.astype(jnp.float32))
        return nll.sum() / n, acc

    l1_, acc1 = ce(logits1, t1)
    l2_, acc2 = ce(logits2, t2)
    return l1_ + l2_, {"accuracy_1": acc1, "accuracy_2": acc2}
