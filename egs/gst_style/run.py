"""GST style-token demonstration at training scale.

The reference trains "Transformer TTS with GST" as a config of record
(/root/reference/Models/transformer.py:96-101, BASELINE.json) but has no
test showing the style pathway DOES anything. This recipe builds a
corpus where a global style is the only unexplained factor, trains the
GST AR Transformer, and demonstrates style transfer at synthesis:

* corpus: the full-pipeline synthetic audio language, except every
  utterance is rendered in one of two STYLES — all phone f0s shifted a
  global +/- ``STYLE_SEMITONES``. The text ids do NOT encode the style,
  so the model can only explain the pitch split through the style
  embedding of the target mel (gst.py:17-21: the training style source
  IS the target mel).
* training: ``cli/train`` with ``gst=True`` (reference Transformer-TTS,
  guided attention for localization).
* evaluation: synthesize the SAME held-out texts twice via
  ``cli/synthesize --ref_mel`` — once with a low-style reference mel,
  once with a high-style one — re-analyze both with the on-device YIN
  f0 extractor, and assert the output pitch follows the REFERENCE MEL's
  style, not the text:

      mean_f0(synth | high ref) / mean_f0(synth | low ref)
          >= ~half the true style ratio

Run: python egs/gst_style/run.py [--max_epoch N] [--keep]
Prints one JSON line; docs/LEARNING_DEMO.md records a committed run.
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

from egs.full_pipeline.run import (  # noqa: E402
    MEL_CFG, HOP, MEL_DIM, N_FFT, SR, VOCAB, phone_duration, phone_wave,
    split_scripts)

STYLE_SEMITONES = 4.0                 # +/- global pitch shift per style


def build_style_corpus(workdir: str, n_texts: int = 32, seed: int = 0):
    """Same audio language as egs/full_pipeline, but EVERY text is
    rendered twice — once per style (all phone f0s shifted a global
    +/- ``STYLE_SEMITONES``). Pitch shift is realized by shifting every
    phone id's base f0 — p maps to f0 via 110 * 2^(p/16), so a
    +/-4-semitone style is a +/- (16*4/12) id offset in f0 space,
    applied inside a wrapped phone_wave.

    Both-styles-per-text is LOAD-BEARING (measured, round 4): a first
    corpus rendered each text in only one style, which makes style a
    deterministic function of the text ids on a memorizable 64-utt
    corpus — the GST pathway then trains as an arbitrary utterance
    bias, and at synthesis the style transfer came out INVERTED
    (f0_ratio 0.87 for a true 1.59 at 800 epochs). With two renderings
    per text the target mel is the only factor that can explain the
    pitch split, exactly the regime the GST paper assumes."""
    rs = np.random.RandomState(seed)
    wav_dir = os.path.join(workdir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    lines, styles = [], {}
    id_shift = 16.0 * STYLE_SEMITONES / 12.0
    for i in range(n_texts):
        phones = rs.randint(1, VOCAB, rs.randint(6, 14))
        d = np.asarray([phone_duration(int(p)) for p in phones], np.int32)
        for style in (0, 1):
            shift = id_shift if style else -id_shift
            audio = np.concatenate([
                phone_wave(float(p) + shift, int(di))
                for p, di in zip(phones, d)])
            stem = f"utt{i}_s{style}"
            path = os.path.join(wav_dir, f"{stem}.wav")
            with wave.open(path, "wb") as fh:
                fh.setnchannels(1)
                fh.setsampwidth(2)
                fh.setframerate(SR)
                fh.writeframes(np.clip(audio * 32767, -32767, 32767)
                               .astype(np.int16).tobytes())
            styles[stem] = style
            lines.append(
                f"{path}|{' '.join(str(int(p)) for p in phones)}")
    with open(os.path.join(workdir, "wavs.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return styles


def mean_f0(path: str) -> float:
    """Voiced-frame mean f0 of a wav, via the same on-device YIN."""
    import jax.numpy as jnp
    from transformer_tts_tpu.ops.features import read_wav, yin_f0
    audio, _ = read_wav(path, expected_rate=SR)
    f0 = np.asarray(yin_f0(jnp.asarray(audio), sample_rate=SR,
                           frame_length=N_FFT, hop_length=HOP,
                           f0_min=71.0, f0_max=500.0))
    voiced = f0[f0 > 0]
    return float(voiced.mean()) if voiced.size else 0.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tts_gst_style")
    ap.add_argument("--max_epoch", type=int, default=800)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    from transformer_tts_tpu.cli import prepare_data as cli_prep
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import train as cli_train

    styles = build_style_corpus(args.workdir)
    feat_dir = os.path.join(args.workdir, "feats")
    cli_prep.main(["--wav_script", os.path.join(args.workdir, "wavs.txt"),
                   "--out_dir", feat_dir,
                   "--sample_rate", str(SR), "--n_fft", str(N_FFT),
                   "--hop_length", str(HOP), "--n_mels", str(MEL_DIM),
                   "--f0_min", "71.0", "--f0_max", "500.0"])
    split_scripts(feat_dir)

    save_dir = os.path.join(args.workdir, "ckpt")
    cfg = dict(
        architecture="text-mel", model="Transformer", reduction_rate=1,
        gst=True, vocab_size=VOCAB, mel_dim=MEL_DIM,
        d_model_encoder=384, d_model_decoder=384,
        n_layer_encoder=4, n_layer_decoder=4,
        n_head_encoder=4, n_head_decoder=4,
        ff_conv_kernel_size_encoder=5, ff_conv_kernel_size_decoder=1,
        batch_size=16, max_epoch=args.max_epoch,
        save_per_epoch=args.max_epoch,
        warmup_step=1000, warmup_factor=1.0, amp=True,
        positive_weight=5.0, guided_attention_weight=2.0,
        train_script=os.path.join(feat_dir, "train.txt"),
        test_script=os.path.join(feat_dir, "test.txt"),
        mean_file=os.path.join(feat_dir, "mean.npy"),
        var_file=os.path.join(feat_dir, "var.npy"),
        lengths_file=os.path.join(feat_dir, "lengths.npy"),
        save_dir=save_dir, log_every=50, num_workers=2,
        text_buckets=(16,), length_buckets=(96,),
    )
    hp_path = os.path.join(args.workdir, "hparams.py")
    with open(hp_path, "w") as fh:
        fh.write("\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    cli_train.main(["--hp_file", hp_path])

    # style references: one mel of each style, from the LAST text —
    # the test split is the first lines, so the refs are not in it
    low = [k for k, s in styles.items() if s == 0][-1]
    high = [k for k, s in styles.items() if s == 1][-1]
    ref_low = os.path.join(feat_dir, f"{low}.npy")
    ref_high = os.path.join(feat_dir, f"{high}.npy")

    # held-out texts synthesized under BOTH styles (same text ids)
    outs = {}
    for name, ref in (("low", ref_low), ("high", ref_high)):
        gen = os.path.join(args.workdir, f"gen_{name}")
        cli_synth.main(["--load_name", save_dir, "--save", gen,
                        "--batch_size", "8", "--ref_mel", ref,
                        "--wav", "--sample_rate", str(SR),
                        "--hop_length", str(HOP), "--n_fft", str(N_FFT)])
        f0s = [mean_f0(os.path.join(gen, f"{i}.wav"))
               for i in range(8)
               if os.path.exists(os.path.join(gen, f"{i}.wav"))]
        outs[name] = float(np.mean([f for f in f0s if f > 0]))

    true_ratio = 2.0 ** (2 * STYLE_SEMITONES / 12.0)
    got_ratio = outs["high"] / max(outs["low"], 1e-6)
    summary = {
        "mean_f0_low_style": round(outs["low"], 2),
        "mean_f0_high_style": round(outs["high"], 2),
        "f0_ratio": round(got_ratio, 4),
        "true_style_ratio": round(true_ratio, 4),
        "epochs": args.max_epoch,
    }
    print(json.dumps(summary), flush=True)
    # style transfer is real: same texts, the output pitch follows the
    # reference mel's style for at least half the true (log) separation
    assert got_ratio >= true_ratio ** 0.5, summary
    if not args.keep:
        shutil.rmtree(args.workdir)
    return summary


if __name__ == "__main__":
    main()
