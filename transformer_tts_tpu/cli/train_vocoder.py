"""Neural-vocoder training CLI (beyond parity — the reference ships no
vocoder and points users at an external one).

``python -m transformer_tts_tpu.cli.train_vocoder --hp_file hp.py \
      --wav_script wavs.txt``

``wav_script``: one wav path per line (extra ``|``-separated fields
ignored — the same file format ``cli/prepare_data.py`` consumes). Audio
is loaded to host RAM once; every step samples ``batch_size`` random
fixed-size segments (so there is exactly ONE compiled signature), the
mel is computed on device inside the jitted step, and the D+G GAN update
runs as one XLA program (vocoder/trainer.py).

Checkpoints: ``vocoder_<k>`` (full GAN state, resumable) every
``--save_every`` steps plus a ``generator`` export (what
``cli/synthesize.py --vocoder`` and the serving engine load).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a neural vocoder")
    parser.add_argument("--hp_file", type=str, required=True)
    parser.add_argument("--wav_script", type=str, required=True)
    parser.add_argument("--mel_script", type=str, default=None,
                        help="fine-tuning mode (the HiFi-GAN production "
                             "recipe): lines 'wav_path|mel.npy' pair each "
                             "wav with the acoustic model's teacher-"
                             "forced mel (cli.teacher_forcing output); "
                             "the generator vocodes the predicted mel, "
                             "the loss target stays the real audio")
    parser.add_argument("--max_steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--save_every", type=int, default=5000)
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--fmin", type=float, default=0.0)
    parser.add_argument("--fmax", type=float, default=None)
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", help="hparams override")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.bench_utils import enable_compilation_cache
    enable_compilation_cache()
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.ops.features import read_wav
    from transformer_tts_tpu.utils import MetricsLogger
    from transformer_tts_tpu.vocoder.trainer import (
        init_vocoder_state, make_vocoder_train_step,
        save_vocoder_checkpoint, restore_vocoder_checkpoint,
        export_generator)

    hp = load_hparams(args.hp_file)
    import ast
    for kv in args.set:
        key, _, value = kv.partition("=")
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        hp.override(**{key: value})
    hp.log_config()
    hp.snapshot(hp.save_dir)

    hop = 1
    for r in hp.vocoder_upsample_rates:
        hop *= r
    seg = hp.vocoder_segment_size
    if seg % hop:
        raise SystemExit(f"vocoder_segment_size {seg} must be a multiple "
                         f"of prod(vocoder_upsample_rates) = {hop}")

    # ---- corpus: all wavs (and fine-tune mels) in host RAM, random
    # crops per step ----
    finetune = args.mel_script is not None
    script = args.mel_script if finetune else args.wav_script
    with open(script) as fh:
        entries = [ln.strip().split("|") for ln in fh if ln.strip()]
    wavs, mels = [], []
    n_frames_seg = seg // hop
    for fields in entries:
        audio, _ = read_wav(fields[0], expected_rate=args.sample_rate)
        if finetune:
            mel = np.asarray(np.load(fields[1]), np.float32)
            if mel.shape[1] != hp.mel_dim:
                raise SystemExit(f"{fields[1]}: mel_dim {mel.shape[1]} "
                                 f"!= hp.mel_dim {hp.mel_dim}")
            # frame-align: audio covers exactly n_frames * hop samples
            n = min(mel.shape[0], len(audio) // hop)
            if n < n_frames_seg:                 # tile short clips
                reps = n_frames_seg // max(n, 1) + 1
                mel = np.tile(mel[:n], (reps, 1))
                audio = np.tile(audio[:n * hop], reps)
                n = mel.shape[0]
            mels.append(mel[:n])
            audio = audio[:n * hop]
        elif len(audio) < seg:                   # tile short clips
            reps = seg // len(audio) + 1
            audio = np.tile(audio, reps)
        wavs.append(np.asarray(audio, np.float32))
    print(f"loaded {len(wavs)} wavs "
          f"({sum(len(w) for w in wavs) / args.sample_rate:.1f}s)"
          + (" [fine-tune on predicted mels]" if finetune else ""))

    rng = np.random.RandomState(hp.seed)

    def sample_batch(bsz):
        out = np.empty((bsz, seg), np.float32)
        out_mel = (np.empty((bsz, n_frames_seg, hp.mel_dim), np.float32)
                   if finetune else None)
        idx = rng.randint(0, len(wavs), size=bsz)
        for i, j in enumerate(idx):
            w = wavs[j]
            if finetune:
                f = rng.randint(0, mels[j].shape[0] - n_frames_seg + 1)
                out_mel[i] = mels[j][f:f + n_frames_seg]
                out[i] = w[f * hop:f * hop + seg]
            else:
                off = rng.randint(0, len(w) - seg + 1)
                out[i] = w[off:off + seg]
        return out, out_mel

    # ---- state + step ----
    state, gen, disc = init_vocoder_state(
        hp, jax.random.PRNGKey(hp.seed), seg)
    start_step = 0
    if hp.loaded_dir:
        state = restore_vocoder_checkpoint(hp.loaded_dir, state,
                                           hp.loaded_epoch)
        start_step = int(state.step)
        print(f"resumed at step {start_step}")
    mel_cfg = dict(sample_rate=args.sample_rate, n_fft=args.n_fft,
                   hop_length=hop, n_mels=hp.mel_dim, fmin=args.fmin,
                   fmax=args.fmax)
    step_fn = make_vocoder_train_step(gen, disc, hp, mel_cfg,
                                      predicted_mel_inputs=finetune)

    # log under save_dir like cli/train.py — a bare hp.log_dir would
    # drop JSONL/TB files into the caller's cwd
    logger = MetricsLogger(os.path.join(hp.save_dir, hp.log_dir))
    key = jax.random.PRNGKey(hp.seed + 1)
    t0 = time.time()
    prev = None                                  # lag prints one step
    for step in range(start_step, args.max_steps):
        audio_np, mel_np = sample_batch(args.batch_size)
        key, sub = jax.random.split(key)
        if finetune:
            state, scalars = step_fn(state, jnp.asarray(audio_np),
                                     jnp.asarray(mel_np), sub)
        else:
            state, scalars = step_fn(state, jnp.asarray(audio_np), sub)
        if prev is not None and (step % hp.log_every == 0):
            s = {k: float(v) for k, v in prev.items()}
            logger.log(step, **s)
            print(f"step {step} "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(s.items()))
                  + f" ({time.time() - t0:.1f}s)", flush=True)
        prev = scalars
        if (step + 1) % args.save_every == 0 or step + 1 == args.max_steps:
            save_vocoder_checkpoint(hp.save_dir, state, step + 1)
            export_generator(hp.save_dir, state)
            print(f"saved vocoder checkpoint @ step {step + 1}")
    logger.close()


if __name__ == "__main__":
    main()
