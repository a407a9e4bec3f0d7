"""One-command FULL-PIPELINE demonstration: raw WAVs -> speaking model.

The reference stops at mels and defers audio to an external aligner and
an external vocoder (/root/reference/README.md:25-28). This recipe runs
the ENTIRE stack in-framework through the real CLIs, end to end:

1. builds a deterministic synthetic *audio* language (each phone id maps
   to a fixed harmonic tone with a fixed duration) and writes 16-bit
   WAVs + the ``wav|text_ids`` script,
2. ``cli/prepare_data``: on-device log-mel / YIN-f0 / energy extraction,
   corpus statistics, lengths cache,
3. durations: by construction (``--durations known``, default) or the
   canonical FastSpeech recipe (``--durations teacher``: train the AR
   Transformer-TTS teacher with ``cli/train``, evaluate it — free-running
   stop-token synthesis length accuracy, mel-L1, alignment
   focus/monotonicity — then ``cli/extract_durations`` from its
   cross-attention),
4. ``cli/train``: FastSpeech2 on the extracted features (pitch+energy
   predictors ON in the standardized-units mode by default —
   ``--no-variance`` for the duration-only adaptor), then
   ``cli/average_checkpoints`` (README.md:22-23 workflow),
5. ``cli/train_vocoder``: a GAN vocoder on the same WAVs (default the
   iSTFT/Vocos family — ``--vocoder-family hifigan`` for time-domain
   upsampling),
6. ``cli/synthesize --vocoder``: text -> mel -> WAVEFORM with predicted
   durations,
7. audio-domain scoring: synthesized and ground-truth wavs are
   re-analyzed with the same on-device featurizer; mel-L1 (pad) and MCD
   (DTW) vs an untrained-acoustic baseline through the same vocoder,
   plus the vocoder's own copy-synthesis quality (ground-truth mel ->
   audio vs ground-truth audio).

Run from the repo root (~6 min on one v5e chip):

    python egs/full_pipeline/run.py [--workdir DIR] [--max_epoch N]
        [--voc_steps N] [--durations known|teacher]

Prints one JSON summary line and asserts (a) the acoustic model's mel
error collapsed vs the untrained baseline and (b) the full pipeline's
audio-domain mel-L1 reached the vocoder's own copy-synthesis floor
(GT-mel -> audio vs GT audio — the best any acoustic model could score
through that vocoder). docs/LEARNING_DEMO.md records a committed chip
run.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

MEL_DIM = 80
VOCAB = 24
SR = 8000
HOP = 128
N_FFT = 512
MEL_CFG = dict(sample_rate=SR, n_fft=N_FFT, hop_length=HOP,
               n_mels=MEL_DIM)


def phone_wave(p: int, n_frames: int) -> np.ndarray:
    """Deterministic BROADBAND harmonic tone for phone id p, WITH
    intra-phone temporal structure.

    12 harmonics with phone-specific amplitudes span up to ~3.6 kHz so
    phone identity shows in (almost) every mel bin. A first version
    used 3 harmonics under 900 Hz; with 65 of 80 mel bins then constant
    silence, the gradient signal rewarding text-dependence was so weak
    the acoustic model converged to a position-only (text-ignoring)
    optimum — measured: output mel delta between two disjoint phone
    sequences 7e-4 after 3.6k steps.

    Two phone-specific TIME-VARYING components (round 4) make frame t a
    function of position-within-phone, not just of phone identity:

    * an exponential f0 GLIDE of g_p in [-5, +5]\\{0} semitones across
      the phone (every harmonic sweeps across mel bins), and
    * a triangular amplitude ENVELOPE (0.35 -> 1.0 -> 0.35, ~9 dB)
      whose peak position is phone-specific.

    A steady tone admits a copy shortcut for teacher-forced AR
    training: away from phone boundaries the next frame EQUALS the
    current one, so cross-attention never needs to localize (round 3's
    measured negative result — docs/LEARNING_DEMO.md). With glides and
    envelopes, predicting frame t requires position-within-phone, which
    the AR decoder can only recover by tracking text progression — the
    property of real speech (coarticulation, prosody) that makes the
    canonical FastSpeech duration bootstrap work.
    """
    f0 = 110.0 * 2.0 ** (p / 16.0)               # 110..297 Hz at onset
    glide = (p * 5) % 11 - 5                     # -5..+5 semitones
    if glide == 0:
        glide = 3
    ratio = 2.0 ** (glide / 12.0)
    n = n_frames * HOP
    t = np.arange(n) / SR
    dur = n / SR
    # exponential chirp: f(t) = f0 * ratio**(t/dur);
    # phase(t) = 2*pi * f0 * dur * (ratio**(t/dur) - 1) / ln(ratio)
    phase = (2 * np.pi * f0 * dur
             * (ratio ** (t / dur) - 1.0) / np.log(ratio))
    x = np.zeros(n)
    f_max = f0 * max(ratio, 1.0)
    for k in range(1, 13):
        if k * f_max >= SR / 2 * 0.95:
            break
        a = (((p * k * 7) % 9) + 1) / 9.0 * 0.8 ** (k - 1)
        x += a * np.sin(k * phase)
    x *= 0.5 / max(np.abs(x).max(), 1e-6)
    # triangular amplitude envelope, phone-specific peak position
    peak = (0.2 + 0.6 * ((p * 3) % 7) / 6.0) * dur
    env = np.where(t <= peak,
                   0.35 + 0.65 * t / max(peak, 1e-6),
                   1.0 - 0.65 * (t - peak) / max(dur - peak, 1e-6))
    ramp = min(40, n // 4)                        # 5 ms edge fades
    env[:ramp] *= np.linspace(0, 1, ramp)
    env[-ramp:] *= np.linspace(1, 0, ramp)
    return (x * env).astype(np.float32)


def phone_duration(p: int) -> int:
    return 3 + p % 4                              # 3..6 frames


def build_audio_corpus(workdir: str, n_utts: int = 64, seed: int = 0,
                       min_phones: int = 6, max_phones: int = 14,
                       duration_jitter: int = 0):
    """``duration_jitter``: optional per-OCCURRENCE +-jitter on each
    phone's base duration (real speech's contextual durations). Used by
    the alignment study (docs/ROUND4_NOTES.md): it was a candidate fix
    for the teacher-attention-never-aligns finding (measured NOT to
    help: corr(true, extracted) 0.03 with jitter vs -0.07 without) and
    it breaks the known-durations floor demo by construction — a
    duration PREDICTOR cannot predict per-occurrence randomness from
    text, so rhythm deviations would floor the pad mel-L1 for every
    duration-predicting model. Default off."""
    rs = np.random.RandomState(seed)
    wav_dir = os.path.join(workdir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    lines, durations = [], {}
    for i in range(n_utts):
        phones = rs.randint(1, VOCAB, rs.randint(min_phones, max_phones))
        d = np.asarray([phone_duration(int(p)) for p in phones], np.int32)
        if duration_jitter:
            d = np.maximum(
                d + rs.randint(-duration_jitter, duration_jitter + 1,
                               size=d.shape), 2).astype(np.int32)
        audio = np.concatenate([phone_wave(int(p), int(di))
                                for p, di in zip(phones, d)])
        path = os.path.join(wav_dir, f"utt{i}.wav")
        with wave.open(path, "wb") as fh:
            fh.setnchannels(1)
            fh.setsampwidth(2)
            fh.setframerate(SR)
            fh.writeframes(np.clip(audio * 32767, -32767, 32767)
                           .astype(np.int16).tobytes())
        # center framing: the extractor emits sum(d)+1 frames; the last
        # phone absorbs the extra frame so durations sum to mel length
        d[-1] += 1
        durations[f"utt{i}"] = d
        lines.append(f"{path}|{' '.join(str(int(p)) for p in phones)}")
    with open(os.path.join(workdir, "wavs.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(workdir, "wav_paths.txt"), "w") as fh:
        fh.write("\n".join(ln.split("|")[0] for ln in lines) + "\n")
    return durations


def write_acoustic_hparams(workdir: str, feat_dir: str, save_dir: str,
                           max_epoch: int, extra: dict | None = None,
                           name: str = "hparams.py"):
    cfg = dict(
        architecture="text-mel", model="Fastspeech2",
        vocab_size=VOCAB, mel_dim=MEL_DIM,
        d_model_encoder=384, d_model_decoder=384,
        n_layer_encoder=6, n_layer_decoder=6,
        n_head_encoder=4, n_head_decoder=4,
        ff_conv_kernel_size_encoder=5, ff_conv_kernel_size_decoder=1,
        batch_size=16, max_epoch=max_epoch, save_per_epoch=max_epoch,
        warmup_step=100, warmup_factor=1.0, amp=True,
        # pitch/energy prediction defaults ON (round 4), in the
        # STANDARDIZED mode: main() overrides these with the corpus
        # f0_mean/f0_std/energy_mean/energy_std from prepare_data's
        # variance_stats.json, which keeps every loss component O(1)
        # (the reference's raw-Hz f0 L1 otherwise dominates loss_total
        # ~10:1 — measured, docs/LEARNING_DEMO.md). `--no-variance`
        # restores the round-3 duration-only adaptor.
        pitch_pred=False, energy_pred=False,
        f0_min=71.0, f0_max=500.0,
        dropout_variance_adaptor=0.1,
        train_script=os.path.join(feat_dir, "train.txt"),
        test_script=os.path.join(feat_dir, "test.txt"),
        mean_file=os.path.join(feat_dir, "mean.npy"),
        var_file=os.path.join(feat_dir, "var.npy"),
        lengths_file=os.path.join(feat_dir, "lengths.npy"),
        save_dir=save_dir, log_every=20, num_workers=2,
        text_buckets=(16,), length_buckets=(96,),
        # vocoder architecture rides in the acoustic hparams so
        # synthesize --vocoder builds the matching generator
        vocoder_type="istft",
        vocoder_upsample_rates=(8, 4, 4),        # hop 128
        vocoder_upsample_kernel_sizes=(16, 8, 8),
        vocoder_istft_n_fft=N_FFT,
        vocoder_convnext_channels=256,
        vocoder_convnext_layers=4,
        vocoder_convnext_mlp=768,
        vocoder_channels=128,
        vocoder_resblock_kernel_sizes=(3, 7),
        vocoder_resblock_dilations=((1, 3, 5), (1, 3, 5)),
        vocoder_periods=(2, 3, 5), vocoder_num_scales=2,
        vocoder_segment_size=2048,               # 16 frames
    )
    cfg.update(extra or {})
    path = os.path.join(workdir, name)
    with open(path, "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    return path, cfg


def split_scripts(feat_dir: str, n_test: int = 8):
    with open(os.path.join(feat_dir, "train_script.txt")) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    with open(os.path.join(feat_dir, "train.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(feat_dir, "test.txt"), "w") as fh:
        fh.write("\n".join(lines[:n_test]) + "\n")
    return lines


def mel_scores(gen_dir: str, feat_dir: str, n_test: int = 8) -> dict:
    """Synthesized de-normalized log-mels vs the extracted ground-truth
    mels (pad semantics of egs/synthetic_overfit): the ACOUSTIC model's
    learning signal, independent of vocoder quality."""
    from transformer_tts_tpu.eval import mel_l1
    l1s = []
    for idx in range(n_test):
        ref = np.load(os.path.join(feat_dir, f"utt{idx}.npy"))
        gen = np.load(os.path.join(gen_dir, f"{idx}.npy"))
        if gen.shape[0] == 0:
            gen = np.zeros_like(ref)
        elif gen.shape[0] < ref.shape[0]:
            gen = np.concatenate(
                [gen, np.zeros((ref.shape[0] - gen.shape[0],
                                gen.shape[1]), gen.dtype)])
        l1s.append(float(mel_l1(ref, gen)))
    return {"mel_l1": float(np.mean(l1s)), "n": n_test}


def audio_scores(gen_dir: str, feat_dir: str, workdir: str,
                 n_test: int = 8) -> dict:
    """Re-analyze synthesized and ground-truth WAVs with the same
    featurizer; mel-L1 (pad semantics of the mel demo) + MCD (DTW)."""
    import jax.numpy as jnp
    from transformer_tts_tpu.eval import mcd, mel_l1
    from transformer_tts_tpu.ops.features import read_wav
    from transformer_tts_tpu.ops.melspectrogram import log_mel_spectrogram

    def logmel(path):
        audio, _ = read_wav(path, expected_rate=SR)
        return np.asarray(log_mel_spectrogram(jnp.asarray(audio),
                                              **MEL_CFG), np.float32)

    l1s, mcds = [], []
    for idx in range(n_test):
        ref = logmel(os.path.join(workdir, "wavs", f"utt{idx}.wav"))
        gen_path = os.path.join(gen_dir, f"{idx}.wav")
        if not os.path.exists(gen_path):
            gen = np.zeros_like(ref)              # no audio: silence
        else:
            gen = logmel(gen_path)
        if gen.shape[0] == 0:
            gen = np.zeros_like(ref)
        elif gen.shape[0] < ref.shape[0]:
            gen = np.concatenate(
                [gen, np.zeros((ref.shape[0] - gen.shape[0],
                                gen.shape[1]), gen.dtype)])
        l1s.append(float(mel_l1(ref, gen)))
        mcds.append(float(mcd(ref, gen)))         # DTW when lengths differ
    return {"mel_l1": float(np.mean(l1s)), "mcd": float(np.mean(mcds)),
            "n": n_test}


def copy_synthesis_score(voc_dir: str, cfg: dict, feat_dir: str,
                         workdir: str, n_test: int = 8) -> dict:
    """Vocode GROUND-TRUTH mels, compare to ground-truth audio: the
    vocoder's own quality, independent of the acoustic model."""
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.eval import mel_l1
    from transformer_tts_tpu.ops.features import read_wav
    from transformer_tts_tpu.ops.melspectrogram import log_mel_spectrogram
    from transformer_tts_tpu.vocoder.trainer import (
        build_vocoder, restore_generator_params)

    gen = build_vocoder(HParams(**cfg), train_dtype=jnp.float32)
    variables = {"params": restore_generator_params(voc_dir)}
    apply_fn = jax.jit(gen.apply)
    l1s = []
    bucket = 96                                   # one compiled signature
    for idx in range(n_test):
        mel = np.load(os.path.join(feat_dir, f"utt{idx}.npy"))
        n = mel.shape[0]
        mel_pad = np.zeros((bucket, mel.shape[1]), np.float32)
        mel_pad[:n] = mel
        wav = np.asarray(apply_fn(
            variables, jnp.asarray(mel_pad)[None]))[0, : n * HOP]
        remel = np.asarray(log_mel_spectrogram(jnp.asarray(wav),
                                               **MEL_CFG), np.float32)
        audio, _ = read_wav(os.path.join(workdir, "wavs",
                                         f"utt{idx}.wav"),
                            expected_rate=SR)
        ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio),
                                             **MEL_CFG), np.float32)
        n = min(remel.shape[0], ref.shape[0])
        l1s.append(float(mel_l1(ref[:n], remel[:n])))
    return {"copy_synthesis_mel_l1": float(np.mean(l1s)), "n": n_test}


def teacher_durations(workdir: str, feat_dir: str, lines, tiny_extra,
                      ar_epochs: int = 400):
    """--durations teacher: AR teacher + cross-attention extraction
    (the canonical FastSpeech recipe; cli/extract_durations.py).

    Returns the AR teacher's own evaluation — the reference's first
    model family demonstrated end to end (train.py:156-267 training,
    test.py:142-184 stop-token synthesis):

    * ``ar_train_loss_first/last``: post-mel L1 collapse over training
      (from the trainer's JSONL curve),
    * ``ar_mel_l1``: free-running (NON-teacher-forced) stop-token
      synthesis on the test set vs ground-truth mels,
    * ``ar_len_err_*``: relative error of the stop-rule termination
      length vs ground truth (test.py:178-184 semantics),
    * ``ar_focus/monotonicity/coverage``: alignment quality of the
      duration-extraction cross-attention head
      (cli/extract_durations.attention_quality).
    """
    import json as _json
    from transformer_tts_tpu.cli import extract_durations as cli_ext
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import train as cli_train
    ar_dir = os.path.join(workdir, "ckpt_ar")
    cfg = dict(
        # reduction_rate=1: the free-running AR tracks the corpus far
        # better feeding back the true previous frame than the
        # first-of-group at r=2 (measured: free-running mel-L1 0.11 vs
        # 1.66, MCD 8.9 vs 15.8 at 1000 epochs) and the alignment
        # resolution is per-frame instead of per-2-frames
        architecture="text-mel", model="Transformer", reduction_rate=1,
        vocab_size=VOCAB, mel_dim=MEL_DIM,
        d_model_encoder=384, d_model_decoder=384,
        n_layer_encoder=6, n_layer_decoder=6,
        n_head_encoder=4, n_head_decoder=4,
        ff_conv_kernel_size_encoder=5, ff_conv_kernel_size_decoder=1,
        batch_size=16, max_epoch=ar_epochs, save_per_epoch=ar_epochs,
        warmup_step=1000, warmup_factor=1.0, amp=True,
        positive_weight=5.0,
        # diagonal attention prior (beyond-parity opt-in, config.py):
        # teacher-forced AR training on this corpus localizes nothing
        # without it (the input frame leaks position-within-phone) —
        # measured: focus 0.39 -> 0.97, monotonicity 0.92 -> 1.0,
        # coverage 0.48 -> 1.0, extracted-duration error 3.9 -> 1.6
        # frames/phone, stop-length error 2.6% -> 1.1% at 1000 epochs
        guided_attention_weight=2.0,
        train_script=os.path.join(feat_dir, "train.txt"),
        test_script=os.path.join(feat_dir, "test.txt"),
        mean_file=os.path.join(feat_dir, "mean.npy"),
        var_file=os.path.join(feat_dir, "var.npy"),
        lengths_file=os.path.join(feat_dir, "lengths.npy"),
        save_dir=ar_dir, log_every=50, num_workers=2,
        text_buckets=(16,), length_buckets=(96,),
    )
    cfg.update(tiny_extra or {})
    hp_path = os.path.join(workdir, "hparams_ar.py")
    with open(hp_path, "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    cli_train.main(["--hp_file", hp_path])
    stats_file = os.path.join(workdir, "duration_stats.json")
    cli_ext.main(["--load_name", ar_dir,       # latest epoch auto-resolved
                  "--script", os.path.join(feat_dir, "train.txt"),
                  "--stats_file", stats_file])

    # free-running AR synthesis with the stop rule (test.py:158-184)
    ar_gen = os.path.join(workdir, "gen_ar")
    cli_synth.main(["--load_name", ar_dir, "--save", ar_gen,
                    "--batch_size", "8"])
    ar_mel = mel_scores(ar_gen, feat_dir)
    from transformer_tts_tpu.eval import mcd
    len_errs, mcds = [], []
    for idx in range(8):
        ref = np.load(os.path.join(feat_dir, f"utt{idx}.npy"))
        gen = np.load(os.path.join(ar_gen, f"{idx}.npy"))
        len_errs.append(abs(gen.shape[0] / ref.shape[0] - 1.0))
        if gen.shape[0]:
            # DTW MCD: quality under the AR's free-running timing drift
            # (pad-L1 punishes a 1-frame shift of a glide corpus hard)
            mcds.append(mcd(ref, gen, use_dtw=True))
    with open(os.path.join(ar_dir, "logs", "train.jsonl")) as fh:
        recs = [_json.loads(ln) for ln in fh if ln.strip()]
    first = float(np.mean([r["loss_frame_after"] for r in recs[:5]]))
    last = float(np.mean([r["loss_frame_after"] for r in recs[-5:]]))
    with open(stats_file) as fh:
        align = _json.load(fh)
    return {
        "ar_train_loss_first": round(first, 4),
        "ar_train_loss_last": round(last, 4),
        "ar_mel_l1": round(ar_mel["mel_l1"], 4),
        "ar_mcd_dtw": round(float(np.mean(mcds)), 3) if mcds else None,
        "ar_len_err_mean": round(float(np.mean(len_errs)), 4),
        "ar_len_err_max": round(float(np.max(len_errs)), 4),
        "ar_focus": round(align["focus"], 4),
        "ar_monotonicity": round(align["monotonicity"], 4),
        "ar_coverage": round(align["coverage"], 4),
    }


def post_indist_scores(post_dir: str, hp_post_path: str, feat_dir: str,
                       n_test: int = 8) -> dict:
    """In-distribution post-model evaluation: apply the trained student
    to the TEACHER-FORCED mels it was trained on (the pregenerated
    ``*_gen.npy`` corpus) and score against ground truth — the direct
    analog of the reference dev line's usage
    (train_fastspeech2_dev.py:140-214 trains on teacher-forced mels;
    the dev loss measures exactly this refinement). Free-run synthesis
    is a DIFFERENT input distribution (predicted durations/f0/energy),
    reported separately."""
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.data.readers import Normalizer
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.post_trainers import init_post_state

    hp = load_hparams(hp_post_path)
    student, p_state = init_post_state(hp, jax.random.PRNGKey(0), None)
    params = ckpt.restore_params(post_dir, p_state.params)
    variables = {"params": params, "batch_stats": p_state.batch_stats,
                 "vq_stats": p_state.vq_stats}
    normalizer = Normalizer(hp.mean_file, hp.var_file, hp.mel_dim)

    tf_errs, post_errs = [], []
    for idx in range(n_test):
        gt = np.load(os.path.join(feat_dir, f"utt{idx}.npy"))
        tf = np.load(os.path.join(feat_dir, f"utt{idx}_gen.npy"))
        phone = np.load(os.path.join(feat_dir,
                                     f"utt{idx}_gen_phone.npy"))
        n = min(gt.shape[0], tf.shape[0])
        tf_errs.append(float(np.abs(tf[:n] - gt[:n]).mean()))
        mel_n = normalizer(tf[:n].astype(np.float32))[None]
        mask = jnp.ones((1, 1, n), bool)
        out, _, _ = student.apply(variables, jnp.asarray(mel_n), mask,
                                  jnp.asarray(phone[None, :n]), None,
                                  train=False)
        refined = normalizer.denormalize(
            np.asarray(out, np.float32)[0] + mel_n[0])
        post_errs.append(float(np.abs(refined - gt[:n]).mean()))
    return {"teacher_forced_mel_l1": round(float(np.mean(tf_errs)), 4),
            "post_teacher_forced_mel_l1": round(
                float(np.mean(post_errs)), 4)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tts_full_pipeline")
    ap.add_argument("--max_epoch", type=int, default=600)
    ap.add_argument("--voc_steps", type=int, default=2000)
    ap.add_argument("--durations", choices=("known", "teacher"),
                    default="known")
    ap.add_argument("--ar_epochs", type=int, default=400,
                    help="AR teacher epochs for --durations teacher")
    ap.add_argument("--vocoder-family", choices=("istft", "hifigan"),
                    default="istft", dest="vocoder_family")
    ap.add_argument("--post", action="store_true",
                    help="also demonstrate the mel-mel post-process "
                         "line: cli/teacher_forcing pregenerated corpus "
                         "-> PostLowEnergy v3 student -> synthesize "
                         "--post_model, scored against the teacher "
                         "alone (train_fastspeech2_dev.py workflow)")
    ap.add_argument("--post_variance", choices=("target", "predicted"),
                    default="predicted",
                    help="teacher_forcing --variance for the student "
                         "corpus. 'predicted' (default, round 5) trains "
                         "the student on the SERVING distribution so "
                         "free-run synthesis improves; 'target' is the "
                         "reference's exact workflow (round-4 run: "
                         "improves in-distribution 5.4x but free-run "
                         "4.5% WORSE — docs/LEARNING_DEMO.md)")
    ap.add_argument("--no-variance", action="store_true",
                    dest="no_variance",
                    help="duration-only variance adaptor (the round-3 "
                         "demo mode); default trains pitch+energy "
                         "predictors in the standardized mode")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-budget variant (d_model 64, 2+2 layers, "
                         "tiny vocoder, relaxed bar: >3x collapse or "
                         "mel-L1 < 1.0) — the weekly-tier CI stand-in")
    args = ap.parse_args(argv)

    if args.tiny:
        args.max_epoch = min(args.max_epoch, 150)
        args.voc_steps = min(args.voc_steps, 500)

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    from transformer_tts_tpu.cli import average_checkpoints as cli_avg
    from transformer_tts_tpu.cli import prepare_data as cli_prep
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import train_vocoder as cli_voc

    # ---- 1+2: audio corpus + on-device feature extraction ----
    durations = build_audio_corpus(args.workdir)
    feat_dir = os.path.join(args.workdir, "feats")
    cli_prep.main(["--wav_script", os.path.join(args.workdir, "wavs.txt"),
                   "--out_dir", feat_dir,
                   "--sample_rate", str(SR), "--n_fft", str(N_FFT),
                   "--hop_length", str(HOP), "--n_mels", str(MEL_DIM),
                   "--f0_min", "71.0", "--f0_max", "500.0"])
    lines = split_scripts(feat_dir)

    extra = {}
    if not args.no_variance:
        with open(os.path.join(feat_dir, "variance_stats.json")) as fh:
            vstats = json.load(fh)
        # p_scheduled_sampling: the reference's own cure for variance
        # exposure bias (train_fastspeech2.py scheduled sampling) — the
        # decoder sometimes trains on PREDICTED pitch/energy embeddings.
        # Without it the corpus's within-phone f0 glides (inexpressible
        # by the phone-constant predictors) put predicted-f0 embeddings
        # off the training manifold at synthesis. Measured A/B on this
        # corpus (1000 epochs, free-running test mel-L1): none 1.59,
        # use_pos 0.88, p_ss=0.5 0.81, both 1.05 (the combination
        # hurts — the PE lets the decoder rely on within-phone detail
        # that scheduled sampling then randomly withholds).
        extra.update(pitch_pred=True, energy_pred=True,
                     p_scheduled_sampling=0.5,
                     f0_mean=vstats["f0_mean"], f0_std=vstats["f0_std"],
                     energy_mean=vstats["energy_mean"],
                     energy_std=vstats["energy_std"])
    if args.tiny:
        extra.update(d_model_encoder=64, d_model_decoder=64,
                     n_layer_encoder=2, n_layer_decoder=2,
                     n_head_encoder=2, n_head_decoder=2,
                     vocoder_convnext_channels=32,
                     vocoder_convnext_layers=2,
                     vocoder_convnext_mlp=64,
                     vocoder_channels=16,
                     vocoder_resblock_kernel_sizes=(3,),
                     vocoder_resblock_dilations=((1, 3),),
                     vocoder_periods=(2, 3), vocoder_num_scales=2)
    if args.vocoder_family == "hifigan":
        extra["vocoder_type"] = "hifigan"

    # ---- 3: durations ----
    ar_eval = None
    if args.durations == "teacher":
        ar_eval = teacher_durations(
            args.workdir, feat_dir, lines,
            dict(d_model_encoder=64, d_model_decoder=64,
                 n_layer_encoder=2, n_layer_decoder=2,
                 n_head_encoder=2, n_head_decoder=2,
                 max_epoch=60) if args.tiny else {},
            ar_epochs=args.ar_epochs)
        # extraction accuracy vs the corpus's KNOWN true durations —
        # the direct health metric of the FastSpeech bootstrap
        derrs, dt_all, de_all = [], [], []
        for line in lines:
            stem = os.path.splitext(
                os.path.basename(line.split("|")[0]))[0]
            dt = durations[stem]
            de = np.load(os.path.join(feat_dir,
                                      f"{stem}_alignment.npy"))
            derrs.append(float(np.abs(dt - de).mean()))
            dt_all += dt.tolist()
            de_all += de.tolist()
        ar_eval["duration_err_frames"] = round(float(np.mean(derrs)), 3)
        ar_eval["duration_corr"] = round(
            float(np.corrcoef(dt_all, de_all)[0, 1]), 3)
    else:
        for line in lines:
            mel_path = line.split("|")[0]
            stem = os.path.splitext(os.path.basename(mel_path))[0]
            np.save(os.path.join(feat_dir, f"{stem}_alignment.npy"),
                    durations[stem])

    # ---- 4: acoustic model (untrained baseline, then the real run) ----
    base_dir = os.path.join(args.workdir, "ckpt_baseline")
    hp0, _ = write_acoustic_hparams(
        args.workdir, feat_dir, base_dir, 1, extra)
    cli_train.main(["--hp_file", hp0, "--max_steps", "1"])

    save_dir = os.path.join(args.workdir, "ckpt")
    hp_path, cfg = write_acoustic_hparams(
        args.workdir, feat_dir, save_dir, args.max_epoch, extra)
    cli_train.main(["--hp_file", hp_path])
    cli_avg.main(["--save_dir", save_dir,
                  "--start_epoch", str(max(1, args.max_epoch - 9)),
                  "--end_epoch", str(args.max_epoch)])
    avg_name = (f"average_epoch{max(1, args.max_epoch - 9)}"
                f"-epoch{args.max_epoch}")

    # ---- 5: vocoder on the same WAVs ----
    voc_save = os.path.join(args.workdir, "ckpt_voc")
    cli_voc.main(["--hp_file", hp_path,
                  "--wav_script", os.path.join(args.workdir,
                                               "wav_paths.txt"),
                  "--max_steps", str(args.voc_steps),
                  "--batch_size", "8",
                  "--save_every", str(args.voc_steps),
                  "--sample_rate", str(SR), "--n_fft", str(N_FFT),
                  "--set", f"save_dir={voc_save!r}"])
    voc_gen_dir = os.path.join(voc_save, "generator")

    # ---- 6: text -> waveform ----
    def synth(load, out):
        cli_synth.main(["--load_name", load, "--save", out,
                        "--batch_size", "8", "--max_frames", "96",
                        "--vocoder", voc_gen_dir,
                        "--sample_rate", str(SR),
                        "--hop_length", str(HOP)])

    base_gen = os.path.join(args.workdir, "gen_baseline")
    synth(os.path.join(base_dir, "epoch_1"), base_gen)
    gen_dir = os.path.join(args.workdir, "gen")
    synth(os.path.join(save_dir, avg_name), gen_dir)

    # ---- 6b (--post): mel-mel post-process line ----
    post_eval = None
    if args.post:
        from transformer_tts_tpu.cli import teacher_forcing as cli_tf
        # pregenerated teacher corpus from the averaged checkpoint
        # (generate_teacher_forcing.py:131-177 semantics + phone feats)
        cli_tf.main(["--load_name", os.path.join(save_dir, avg_name),
                     "--save_phone", "--variance", args.post_variance])
        post_dir = os.path.join(args.workdir, "ckpt_post")
        post_epochs = max(args.max_epoch // 2, 1)
        hp_post_path, _ = write_acoustic_hparams(
            args.workdir, feat_dir, post_dir, post_epochs,
            dict(extra, architecture="mel-mel", version=3,
                 phone_embed=True, n_layer_post_model=2,
                 teacher_suffix="_gen",
                 save_per_epoch=post_epochs),
            name="hparams_post.py")
        cli_train.main(["--hp_file", hp_post_path])
        gen_post = os.path.join(args.workdir, "gen_post")
        cli_synth.main(["--load_name", os.path.join(save_dir, avg_name),
                        "--save", gen_post, "--batch_size", "8",
                        "--max_frames", "96",
                        "--post_model", post_dir,
                        "--hp_file", hp_post_path,
                        "--vocoder", voc_gen_dir,
                        "--sample_rate", str(SR),
                        "--hop_length", str(HOP)])
        post_mel = mel_scores(gen_post, feat_dir)
        post_audio = audio_scores(gen_post, feat_dir, args.workdir)
        with open(os.path.join(post_dir, "logs", "train.jsonl")) as fh:
            precs = [json.loads(ln) for ln in fh if ln.strip()]
        post_eval = {
            "post_mel_l1": round(post_mel["mel_l1"], 4),
            "post_audio_mel_l1": round(post_audio["mel_l1"], 4),
            "post_audio_mcd": round(post_audio["mcd"], 3),
            "post_train_loss_first": round(float(np.mean(
                [rec["loss_post"] for rec in precs[:5]])), 4),
            "post_train_loss_last": round(float(np.mean(
                [rec["loss_post"] for rec in precs[-5:]])), 4),
        }
        post_eval.update(post_indist_scores(post_dir, hp_post_path,
                                            feat_dir))

    # ---- 7: scores ----
    # mel domain (acoustic learning), audio domain (full pipeline), and
    # the vocoder's own copy-synthesis floor (GT mel -> audio vs GT
    # audio) — the pipeline cannot score better than that floor, so the
    # pass criteria are (a) the acoustic model's mel error collapses and
    # (b) the full pipeline reaches the vocoder floor.
    base_mel = mel_scores(base_gen, feat_dir)
    trained_mel = mel_scores(gen_dir, feat_dir)
    var_eval = None
    if not args.no_variance:
        # pitch/energy predictor collapse, from the trainer's JSONL
        # curve (standardized units — O(1) scale, config.py f0_mean)
        with open(os.path.join(save_dir, "logs", "train.jsonl")) as fh:
            recs = [json.loads(ln) for ln in fh if ln.strip()]
        var_eval = {}
        for key in ("loss_f0", "loss_energy"):
            var_eval[f"{key}_first"] = round(
                float(np.mean([r[key] for r in recs[:5]])), 4)
            var_eval[f"{key}_last"] = round(
                float(np.mean([r[key] for r in recs[-5:]])), 4)
    baseline = audio_scores(base_gen, feat_dir, args.workdir)
    trained = audio_scores(gen_dir, feat_dir, args.workdir)
    voc_quality = copy_synthesis_score(voc_gen_dir, cfg, feat_dir,
                                       args.workdir)
    copy_syn = voc_quality["copy_synthesis_mel_l1"]
    summary = {
        "baseline_mel_l1": round(base_mel["mel_l1"], 4),
        "trained_mel_l1": round(trained_mel["mel_l1"], 4),
        "mel_collapse_x": round(base_mel["mel_l1"]
                                / max(trained_mel["mel_l1"], 1e-9), 1),
        "baseline_audio_mel_l1": round(baseline["mel_l1"], 4),
        "baseline_audio_mcd": round(baseline["mcd"], 3),
        "trained_audio_mel_l1": round(trained["mel_l1"], 4),
        "trained_audio_mcd": round(trained["mcd"], 3),
        "copy_synthesis_mel_l1": round(copy_syn, 4),
        "audio_gap_to_vocoder_floor": round(
            trained["mel_l1"] - copy_syn, 4),
        "epochs": args.max_epoch, "voc_steps": args.voc_steps,
        "durations": args.durations,
        "vocoder_family": args.vocoder_family,
    }
    if ar_eval is not None:
        summary.update(ar_eval)
    if var_eval is not None:
        summary.update(var_eval)
    if post_eval is not None:
        summary.update(post_eval)
    print(json.dumps(summary), flush=True)
    if post_eval is not None and not args.tiny:
        # the mel-mel student refines its teacher in-distribution (the
        # reference dev line's own claim — train_fastspeech2_dev.py
        # trains AND validates on teacher-forced mels), and — with the
        # SERVING-distribution corpus (--post_variance predicted,
        # round 5) — improves FREE-RUN synthesis outright. Measured:
        #   target-variance corpus (r4): in-dist 0.0728 -> 0.0136
        #     (5.4x) but free-run 0.6246 -> 0.6527 (4.5% WORSE) — the
        #     student never saw the teacher's predicted-f0/energy
        #     errors it must correct at synthesis time;
        #   predicted-variance corpus (r5, default): in-dist
        #     0.6301 -> 0.078 (8.1x) AND free-run 0.6246 -> 0.1736
        #     (3.6x better; audio MCD 47.2 -> 30.7, gap to the vocoder
        #     copy-synthesis floor 0.4356 -> 0.079).
        assert post_eval["post_train_loss_last"] \
            < post_eval["post_train_loss_first"], post_eval
        assert post_eval["post_teacher_forced_mel_l1"] \
            < post_eval["teacher_forced_mel_l1"], post_eval
        if args.post_variance == "predicted":
            # serving-distribution student: free-run must IMPROVE
            assert post_eval["post_mel_l1"] \
                < trained_mel["mel_l1"], post_eval
        else:
            # reference exact workflow: in-dist refinement is the
            # claim; free-run only guarded against a real regression
            assert post_eval["post_mel_l1"] \
                < trained_mel["mel_l1"] * 1.15, post_eval
    if var_eval is not None and not args.tiny:
        # the variance predictors learned (standardized-unit L1 curves).
        # Bar is 1.5x, not ->0: the predictor input is length-regulated
        # phone features with NO position-within-phone (reference
        # architecture, varianceadaptor.py:94-126), so the within-phone
        # glide/envelope variation this corpus deliberately carries is
        # an irreducible floor — e.g. every phone shares the same
        # triangular amplitude envelope shape, capping the energy
        # collapse near 2x (measured 1.98x at 1000 epochs).
        assert var_eval["loss_f0_last"] * 1.5 \
            < var_eval["loss_f0_first"], var_eval
        assert var_eval["loss_energy_last"] * 1.5 \
            < var_eval["loss_energy_first"], var_eval
    if ar_eval is not None and not args.tiny:
        # the AR teacher itself learned: train-loss collapse, the stop
        # rule terminates within 10% of ground-truth length (mean), and
        # the extraction attention is near-monotonic with real phone
        # coverage (the round-3 degenerate alignment had coverage
        # ~1/n_phones)
        assert ar_eval["ar_train_loss_last"] * 3 \
            < ar_eval["ar_train_loss_first"], ar_eval
        assert ar_eval["ar_len_err_mean"] <= 0.10, ar_eval
        assert ar_eval["ar_monotonicity"] >= 0.90, ar_eval
        assert ar_eval["ar_coverage"] >= 0.80, ar_eval
    if args.tiny:
        ok_acoustic = (trained_mel["mel_l1"] < 2.0
                       or trained_mel["mel_l1"] * 1.5
                       < base_mel["mel_l1"])
        ok_pipeline = trained["mel_l1"] < copy_syn + 1.5
    elif args.durations == "teacher":
        # RHYTHM-TOLERANT bars for the bootstrap branch. Measured and
        # documented (docs/ROUND4_NOTES.md alignment study): on this
        # synthetic corpus the teacher's cross-attention never encodes
        # the true duration variation (position-within-phone leaks
        # through the AR input frame and 64 utterances are memorizable
        # by a 35M decoder — corr(true, extracted) ~ 0 across six
        # controlled variants), so the student speaks the right phones
        # on a near-uniform rhythm. Pad-aligned mel-L1 punishes every
        # rhythm deviation; DTW MCD scores the content.
        ok_acoustic = (trained_mel["mel_l1"] * 1.8 < base_mel["mel_l1"])
        ok_pipeline = trained["mcd"] < 75.0
    else:
        ok_acoustic = (trained_mel["mel_l1"] < 1.0
                       or trained_mel["mel_l1"] * 5
                       < base_mel["mel_l1"])
        ok_pipeline = trained["mel_l1"] < copy_syn + 1.0
    assert ok_acoustic, f"acoustic model did not learn: {summary}"
    assert ok_pipeline, \
        f"pipeline did not reach its quality bar: {summary}"
    if not args.keep:
        shutil.rmtree(args.workdir)
    return summary


if __name__ == "__main__":
    main()
