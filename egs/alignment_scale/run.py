"""Duration-extraction accuracy where attention is LOAD-BEARING.

Settles the round-4 open question (docs/ROUND4_NOTES.md "alignment
study"): on the 64-utterance demo corpora, corr(true, MAS-extracted
durations) ~ 0 even though attention looks textbook (focus ~0.97,
monotonicity ~1.0). The documented explanation — a memorizable corpus
makes cross-attention non-load-bearing, so its mass need not encode the
true alignment — was plausible but unfalsified.

No real speech exists in this environment (zero egress), so this recipe
builds the closest falsifier the synthetic audio language admits: a
corpus the teacher CANNOT memorize, where tracking text progression
through cross-attention is the only way to predict boundaries:

* SCALE: ``--n_utts 768`` (vs 64) — ~48k mel frames against a teacher
  shrunk to d_model 256 / 3+3 layers,
* PER-OCCURRENCE DURATION JITTER (+-2 frames on a 3..6-frame base):
  boundary timing is unpredictable from phone identity alone — the
  decoder must notice each boundary from the input and look up WHICH
  phone comes next, per utterance,
* held-out texts: the last ``--n_test`` utterances are excluded from
  training and extraction runs on them too — memorization of training
  texts cannot explain held-out alignment accuracy.

Pipeline: build corpus -> cli/prepare_data -> cli/train (AR
Transformer, r=1, guided attention) -> cli/extract_durations (MAS) ->
corr/err vs the constructed ground truth, train vs held-out.

Run: python egs/alignment_scale/run.py [--n_utts N] [--ar_epochs N]
Prints one JSON line; docs/LEARNING_DEMO.md records the committed run
and its verdict either way (corr > 0.5 validates the memorizability
explanation and the extractor where it matters; a low corr at this
scale is an honest negative for attention-derived durations on
formant-style corpora).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from egs.full_pipeline.run import (  # noqa: E402
    HOP, MEL_DIM, N_FFT, SR, VOCAB, build_audio_corpus)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tts_alignment_scale")
    ap.add_argument("--n_utts", type=int, default=768)
    ap.add_argument("--n_test", type=int, default=32,
                    help="held-out texts (never trained, still "
                         "extracted)")
    ap.add_argument("--duration_jitter", type=int, default=2)
    ap.add_argument("--ar_epochs", type=int, default=150)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--n_layers", type=int, default=3)
    ap.add_argument("--guided_attention", type=float, default=2.0)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    from transformer_tts_tpu.cli import extract_durations as cli_ext
    from transformer_tts_tpu.cli import prepare_data as cli_prep
    from transformer_tts_tpu.cli import train as cli_train

    durations = build_audio_corpus(
        args.workdir, n_utts=args.n_utts,
        duration_jitter=args.duration_jitter)
    feat_dir = os.path.join(args.workdir, "feats")
    cli_prep.main(["--wav_script", os.path.join(args.workdir, "wavs.txt"),
                   "--out_dir", feat_dir,
                   "--sample_rate", str(SR), "--n_fft", str(N_FFT),
                   "--hop_length", str(HOP), "--n_mels", str(MEL_DIM),
                   "--f0_min", "71.0", "--f0_max", "500.0"])
    with open(os.path.join(feat_dir, "train_script.txt")) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    # the LAST n_test utterances are held out of training entirely
    train_lines = lines[:-args.n_test]
    held_lines = lines[-args.n_test:]
    with open(os.path.join(feat_dir, "train.txt"), "w") as fh:
        fh.write("\n".join(train_lines) + "\n")
    with open(os.path.join(feat_dir, "test.txt"), "w") as fh:
        fh.write("\n".join(held_lines) + "\n")
    with open(os.path.join(feat_dir, "all.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    ar_dir = os.path.join(args.workdir, "ckpt_ar")
    cfg = dict(
        architecture="text-mel", model="Transformer", reduction_rate=1,
        vocab_size=VOCAB, mel_dim=MEL_DIM,
        d_model_encoder=args.d_model, d_model_decoder=args.d_model,
        n_layer_encoder=args.n_layers, n_layer_decoder=args.n_layers,
        n_head_encoder=4, n_head_decoder=4,
        ff_conv_kernel_size_encoder=5, ff_conv_kernel_size_decoder=1,
        batch_size=16, max_epoch=args.ar_epochs,
        save_per_epoch=args.ar_epochs,
        warmup_step=1000, warmup_factor=1.0, amp=True,
        positive_weight=5.0,
        guided_attention_weight=args.guided_attention,
        train_script=os.path.join(feat_dir, "train.txt"),
        test_script=os.path.join(feat_dir, "test.txt"),
        mean_file=os.path.join(feat_dir, "mean.npy"),
        var_file=os.path.join(feat_dir, "var.npy"),
        lengths_file=os.path.join(feat_dir, "lengths.npy"),
        save_dir=ar_dir, log_every=100, num_workers=2,
        text_buckets=(16,), length_buckets=(96,),
    )
    hp_path = os.path.join(args.workdir, "hparams_ar.py")
    with open(hp_path, "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    cli_train.main(["--hp_file", hp_path])

    # MAS extraction over ALL utterances (train + held-out)
    stats_file = os.path.join(args.workdir, "duration_stats.json")
    cli_ext.main(["--load_name", ar_dir,
                  "--script", os.path.join(feat_dir, "all.txt"),
                  "--stats_file", stats_file])

    def score(subset_lines):
        errs, dt_all, de_all = [], [], []
        for line in subset_lines:
            stem = os.path.splitext(
                os.path.basename(line.split("|")[0]))[0]
            dt = durations[stem]
            de = np.load(os.path.join(feat_dir,
                                      f"{stem}_alignment.npy"))
            errs.append(float(np.abs(dt - de).mean()))
            dt_all += dt.tolist()
            de_all += de.tolist()
        return (round(float(np.mean(errs)), 3),
                round(float(np.corrcoef(dt_all, de_all)[0, 1]), 3))

    train_err, train_corr = score(train_lines)
    held_err, held_corr = score(held_lines)
    with open(stats_file) as fh:
        align = json.load(fh)
    summary = {
        "n_utts": args.n_utts, "duration_jitter": args.duration_jitter,
        "ar_epochs": args.ar_epochs,
        "teacher": f"d{args.d_model}_{args.n_layers}+{args.n_layers}",
        "duration_err_frames_train": train_err,
        "duration_corr_train": train_corr,
        "duration_err_frames_held_out": held_err,
        "duration_corr_held_out": held_corr,
        "focus": round(align["focus"], 4),
        "monotonicity": round(align["monotonicity"], 4),
        "coverage": round(align["coverage"], 4),
    }
    print(json.dumps(summary), flush=True)
    if not args.keep:
        shutil.rmtree(args.workdir)
    return summary


if __name__ == "__main__":
    main()
