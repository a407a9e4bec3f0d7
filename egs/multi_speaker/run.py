"""Multi-speaker conditioning demonstration at training scale.

The reference's FastSpeech2 carries speaker conditioning as a headline
feature (``spk_emb_architecture`` with per-layer softsign biases,
Models/fastspeech2.py + Models/layers.py:20-39; x-vector loading in
datasets/datasets_fastspeech2.py) but ships no test that the pathway
actually separates speakers. This recipe builds a corpus where SPEAKER
is the only unexplained factor, trains FastSpeech2 in each conditioning
mode, and demonstrates that synthesis follows the speaker label:

* corpus: the full-pipeline synthetic audio language, except every text
  is rendered TWICE — once per SPEAKER, all phone f0s shifted a global
  +/- ``SPK_SEMITONES``. The text ids do NOT encode the speaker (both
  renderings share them), so the model can only explain the pitch split
  through the speaker conditioning input — the same
  both-variants-per-text construction that egs/gst_style/run.py
  measured to be load-bearing.
* training: ``cli/train`` FastSpeech2 (known durations, pitch/energy
  predictors ON in standardized units) with
  ``spk_emb_architecture="encoder"`` in BOTH reference modes:
  - ``spk_emb_type="speaker_id"``: per-layer softsign bias over an
    nn.Embed speaker table (layers.py:20-39 id branch),
  - ``spk_emb_type="x_vector"``: per-utterance 512-dim vectors
    ({stem}_xvector.npy next to each mel, the reference's dataset
    convention), softsign over a Dense projection (layers.py:22).
* evaluation: synthesize held-out TEXTS under both speaker labels (the
  test split carries each text once per speaker), re-analyze the wavs
  with the on-device YIN f0 extractor, and assert output pitch follows
  the SPEAKER conditioning for at least half the true (log) separation:

      mean_f0(synth | spk 1) / mean_f0(synth | spk 0)
          >= true_ratio ** 0.5

Run: python egs/multi_speaker/run.py [--max_epoch N] [--keep]
     [--modes speaker_id,x_vector]
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
    HOP, MEL_DIM, N_FFT, SR, VOCAB, phone_duration, phone_wave)
from egs.gst_style.run import mean_f0  # noqa: E402

SPK_SEMITONES = 4.0            # +/- global pitch shift per speaker
XVEC_DIM = 512                 # reference x-vector convention


def build_speaker_corpus(workdir: str, n_texts: int = 32, seed: int = 0):
    """Every text rendered once per speaker; speaker realized as a
    global +/- ``SPK_SEMITONES`` f0 shift via the phone-id offset
    (p maps to f0 as 110 * 2^(p/16), so +/-4 semitones is a
    +/- 16*4/12 id offset in f0 space). Durations keyed by the ORIGINAL
    phone id, so both speakers share rhythm — pitch is the speaker cue.

    Returns (speaker-by-stem dict, durations-by-stem dict)."""
    rs = np.random.RandomState(seed)
    wav_dir = os.path.join(workdir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    lines, speakers, durations = [], {}, {}
    id_shift = 16.0 * SPK_SEMITONES / 12.0
    for i in range(n_texts):
        phones = rs.randint(1, VOCAB, rs.randint(6, 14))
        d = np.asarray([phone_duration(int(p)) for p in phones], np.int32)
        for spk in (0, 1):
            shift = id_shift if spk else -id_shift
            audio = np.concatenate([
                phone_wave(float(p) + shift, int(di))
                for p, di in zip(phones, d)])
            stem = f"utt{i}_spk{spk}"
            path = os.path.join(wav_dir, f"{stem}.wav")
            with wave.open(path, "wb") as fh:
                fh.setnchannels(1)
                fh.setsampwidth(2)
                fh.setframerate(SR)
                fh.writeframes(np.clip(audio * 32767, -32767, 32767)
                               .astype(np.int16).tobytes())
            speakers[stem] = spk
            # center framing: extractor emits sum(d)+1 frames
            dd = d.copy()
            dd[-1] += 1
            durations[stem] = dd
            lines.append(
                f"{path}|{' '.join(str(int(p)) for p in phones)}|{spk}")
    with open(os.path.join(workdir, "wavs.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return speakers, durations


def write_xvectors(feat_dir: str, speakers: dict, seed: int = 1):
    """Per-utterance synthetic x-vectors: a fixed unit direction per
    speaker plus small per-utterance noise (real x-vectors cluster by
    speaker with within-speaker scatter). Written as
    ``{stem}_xvector.npy`` next to each mel — the path convention
    data/dataset.py:117-119 shares with the reference's FS2 datasets."""
    rs = np.random.RandomState(seed)
    centers = {s: rs.randn(XVEC_DIM).astype(np.float32)
               for s in (0, 1)}
    for stem, spk in speakers.items():
        v = centers[spk] + 0.05 * rs.randn(XVEC_DIM).astype(np.float32)
        v /= np.linalg.norm(v).clip(1e-6)
        np.save(os.path.join(feat_dir, f"{stem}_xvector.npy"), v)


def run_mode(mode: str, workdir: str, feat_dir: str, speakers: dict,
             max_epoch: int) -> dict:
    from egs.full_pipeline.run import write_acoustic_hparams
    from transformer_tts_tpu.cli import average_checkpoints as cli_avg
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import train as cli_train

    vstats = json.load(open(os.path.join(feat_dir,
                                         "variance_stats.json")))
    save_dir = os.path.join(workdir, f"ckpt_{mode}")
    extra = dict(
        is_multi_speaker=True, spk_emb_type=mode,
        spk_emb_dim=(2 if mode == "speaker_id" else XVEC_DIM),
        spk_emb_architecture="encoder",
        pitch_pred=True, energy_pred=True, p_scheduled_sampling=0.5,
        f0_mean=vstats["f0_mean"], f0_std=vstats["f0_std"],
        energy_mean=vstats["energy_mean"],
        energy_std=vstats["energy_std"],
    )
    hp_path, _ = write_acoustic_hparams(
        workdir, feat_dir, save_dir, max_epoch, extra,
        name=f"hparams_{mode}.py")
    cli_train.main(["--hp_file", hp_path])
    cli_avg.main(["--save_dir", save_dir,
                  "--start_epoch", str(max(1, max_epoch - 9)),
                  "--end_epoch", str(max_epoch)])
    avg = (f"average_epoch{max(1, max_epoch - 9)}-epoch{max_epoch}")

    gen = os.path.join(workdir, f"gen_{mode}")
    cli_synth.main(["--load_name", os.path.join(save_dir, avg),
                    "--save", gen, "--batch_size", "8",
                    "--max_frames", "96", "--wav",
                    "--sample_rate", str(SR), "--hop_length", str(HOP),
                    "--n_fft", str(N_FFT)])

    # index -> speaker via the test-script line order
    with open(os.path.join(feat_dir, "test.txt")) as fh:
        test_lines = [ln.strip() for ln in fh if ln.strip()]
    f0s = {0: [], 1: []}
    for i, line in enumerate(test_lines):
        stem = os.path.splitext(os.path.basename(line.split("|")[0]))[0]
        wav = os.path.join(gen, f"{i}.wav")
        if os.path.exists(wav):
            v = mean_f0(wav)
            if v > 0:
                f0s[speakers[stem]].append(v)
    lo = float(np.mean(f0s[0])) if f0s[0] else 0.0
    hi = float(np.mean(f0s[1])) if f0s[1] else 0.0
    return {
        f"{mode}_mean_f0_spk0": round(lo, 2),
        f"{mode}_mean_f0_spk1": round(hi, 2),
        f"{mode}_f0_ratio": round(hi / max(lo, 1e-6), 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tts_multi_speaker")
    ap.add_argument("--max_epoch", type=int, default=800)
    ap.add_argument("--modes", default="speaker_id,x_vector")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    from egs.full_pipeline.run import split_scripts
    from transformer_tts_tpu.cli import prepare_data as cli_prep

    speakers, durations = build_speaker_corpus(args.workdir)
    feat_dir = os.path.join(args.workdir, "feats")
    cli_prep.main(["--wav_script", os.path.join(args.workdir, "wavs.txt"),
                   "--out_dir", feat_dir,
                   "--sample_rate", str(SR), "--n_fft", str(N_FFT),
                   "--hop_length", str(HOP), "--n_mels", str(MEL_DIM),
                   "--f0_min", "71.0", "--f0_max", "500.0"])
    # test split: FIRST lines = the first texts, each present once per
    # speaker (corpus order interleaves spk0/spk1) — held-out texts
    # synthesized under both labels
    split_scripts(feat_dir)
    for stem, d in durations.items():
        np.save(os.path.join(feat_dir, f"{stem}_alignment.npy"), d)

    write_xvectors(feat_dir, speakers)

    true_ratio = 2.0 ** (2 * SPK_SEMITONES / 12.0)
    summary = {"true_speaker_ratio": round(true_ratio, 4),
               "epochs": args.max_epoch}
    for mode in args.modes.split(","):
        summary.update(run_mode(mode.strip(), args.workdir, feat_dir,
                                speakers, args.max_epoch))
    print(json.dumps(summary), flush=True)
    # speaker conditioning is real: same texts, the output pitch follows
    # the speaker label for at least half the true (log) separation
    for mode in args.modes.split(","):
        key = f"{mode.strip()}_f0_ratio"
        assert summary[key] >= true_ratio ** 0.5, summary
    if not args.keep:
        shutil.rmtree(args.workdir)
    return summary


if __name__ == "__main__":
    main()
