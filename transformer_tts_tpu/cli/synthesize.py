"""Synthesis CLI (the reference's test_*.py family).

``python -m transformer_tts_tpu.cli.synthesize --load_name <ckpt_dir> \
      [--test_script s.txt] [--save out_dir] [--pitch_perturbation] \
      [--duration_perturbation] [--epoch N]``

Reference behaviors kept:
* hparams auto-discovered from the checkpoint's directory
  (test_fastspeech2.py:99-103 — the config travels with the checkpoint);
* NAR FastSpeech2: one forward per utterance, de-normalized mel saved as
  ``<idx>.npy`` plus predicted durations as ``<idx>_alignment.npy``
  (test_fastspeech2.py:199-201);
* AR Transformer: KV-cached incremental decode (stop rule sigmoid>0.5,
  cap 500) instead of the reference's full-prefix re-forward;
* elapsed / total time prints (test_fastspeech2.py:203-204) — the RTF
  measurement hook;
* --pitch_perturbation / --duration_perturbation sample a factor from
  {0.8, 0.9, 1.0, 1.1, 1.2} per utterance (test_fastspeech2.py:93-94).
* mel-mel post-processing (test_fastspeech2_dev.py): --post_model <dir>
  runs the PostLowEnergy student on top, replace (v<=2,4) or residual
  (v3,5,6) per hp.version (:207-227).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_name", type=str, required=True,
                        help="checkpoint dir (save_dir or epoch_N)")
    parser.add_argument("--hp_file", type=str, default=None)
    parser.add_argument("--test_script", type=str, default=None)
    parser.add_argument("--save", type=str, default="./generated")
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--pitch_perturbation", action="store_true")
    parser.add_argument("--duration_perturbation", action="store_true")
    parser.add_argument("--post_model", type=str, default=None,
                        help="mel-mel student checkpoint dir (dev path)")
    parser.add_argument("--max_frames", type=int, default=2048)
    parser.add_argument("--use_prenet", action="store_true",
                        help="save the pre-postnet mel (test_fastspeech2 "
                             "--use_prenet equivalent)")
    parser.add_argument("--save_prenet", action="store_true",
                        help="text-mel-mel path: save the FS2 prenet "
                             "output as the main mel instead of the "
                             "post-model-refined one (integrate tester "
                             "--save_prenet, "
                             "test_fastspeech2_dev_integrate_train.py:211)")
    parser.add_argument("--ref_mel", type=str, default=None,
                        help="reference mel .npy for GST style "
                             "conditioning at synthesis "
                             "(transformer.py:96-101 eval path)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="utterances per forward (the reference is "
                             "batch-1 only; batching amortizes dispatch "
                             "for production serving)")
    parser.add_argument("--wav", action="store_true",
                        help="also write Griffin-Lim waveforms "
                             "(assumes natural-log mel power features; "
                             "the reference needs an external vocoder)")
    parser.add_argument("--vocoder", type=str, default=None,
                        help="neural-vocoder checkpoint (generator "
                             "export or vocoder_<k> dir from "
                             "cli.train_vocoder); replaces Griffin-Lim "
                             "for --wav output. Implies --wav.")
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--hop_length", type=int, default=256)
    parser.add_argument("--n_fft", type=int, default=1024,
                        help="FFT size for the Griffin-Lim fallback; "
                             "set to the analysis n_fft so the mel "
                             "filterbank inversion matches the features")
    args = parser.parse_args(argv)

    import random
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.data import TTSDataset, collate
    from transformer_tts_tpu.data.readers import Normalizer
    from transformer_tts_tpu.data.batching import pick_bucket
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_fastspeech2, synthesize_integrate,
        synthesize_tacotron2, synthesize_transformer_tts,
        sample_perturbation)
    from transformer_tts_tpu.ops.masks import pad_mask
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, init_transformer_state)

    load_dir = args.load_name
    if os.path.basename(load_dir).startswith(("epoch_", "average_")):
        hp_dir = os.path.dirname(load_dir)
    else:
        hp_dir = load_dir
    hp_file = args.hp_file or os.path.join(hp_dir, "hparams.py")
    hp = load_hparams(hp_file)
    if args.test_script:
        hp.test_script = args.test_script
    os.makedirs(args.save, exist_ok=True)

    from transformer_tts_tpu.config import is_nar_model
    is_ar = not is_nar_model(hp.model)
    # text-mel-mel snapshot -> the joint (debug=True) model with the
    # attached post-model (test_fastspeech2_dev_integrate_train.py:112-119)
    is_integrate = hp.architecture == "text-mel-mel"
    rng = jax.random.PRNGKey(0)
    if is_ar:
        model, state = init_transformer_state(hp, rng)
    else:
        model, state = init_fastspeech2_state(
            hp, rng, enable_post_model=is_integrate)
    # full variable restore: conformer/GST BatchNorm running stats must
    # come from the checkpoint, not from init (test_fastspeech2.py:49-52
    # restores the whole state_dict)
    variables = ckpt.restore_variables(load_dir, state, epoch=args.epoch)

    vocoder = None
    if args.vocoder is not None:
        from transformer_tts_tpu.vocoder.trainer import (
            build_vocoder, restore_generator_params)
        args.wav = True
        voc_gen = build_vocoder(hp, train_dtype=jnp.float32)
        # one jitted apply reused across utterances (bucketed T)
        vocoder = (voc_gen, jax.jit(voc_gen.apply),
                   {"params": restore_generator_params(args.vocoder)})

    post_model = post_variables = None
    if args.post_model is not None:
        from transformer_tts_tpu.train.post_trainers import (
            build_post_model, init_post_state)
        post_model, p_state = init_post_state(hp, rng, model)
        p_params = ckpt.restore_params(args.post_model, p_state.params)
        post_variables = {"params": p_params,
                          "batch_stats": p_state.batch_stats,
                          "vq_stats": p_state.vq_stats}

    normalizer = Normalizer(hp.mean_file, hp.var_file, hp.mel_dim)
    mean, var = normalizer.arrays()
    mean_j = jnp.asarray(mean) if mean is not None else None
    var_j = jnp.asarray(var) if var is not None else None

    dataset = TTSDataset(hp.test_script, hp, test_mode=True)
    prng = random.Random(77)
    ref_mel = None
    if args.ref_mel is not None:
        ref_np = normalizer(np.load(args.ref_mel).astype(np.float32))
        ref_mel = jnp.asarray(ref_np)[None]

    start_time = time.time()
    elapsed = 0.0
    bs = max(1, args.batch_size)
    indices = list(range(len(dataset)))
    for lo in range(0, len(indices), bs):
        chunk = indices[lo: lo + bs]
        samples = [dataset[i] for i in chunk]
        # pad_batch buckets the batch dim so batch sizes stay static
        batch = collate(samples, hp, pad_batch=(bs > 1))
        n_real = len(chunk)
        text = jnp.asarray(batch["text"])
        pos_text = jnp.asarray(batch["pos_text"])
        spk_emb = (jnp.asarray(batch["spk_emb"])
                   if "spk_emb" in batch else None)
        t0 = time.time()
        if is_ar:
            # decoder_type selects the AR decode loop
            # (Models/transformer.py:86-87): KV-cached transformer decode
            # or the Tacotron2 zoneout-LSTM loop
            synth_ar = (synthesize_tacotron2
                        if hp.decoder_type.lower() == "tacotron2"
                        else synthesize_transformer_tts)
            mel, lengths = synth_ar(
                model, variables, text, pos_text, spk_emb, ref_mel,
                mean=mean_j, var=var_j)
            mel_np = np.asarray(mel)
            lens = [int(lengths[j]) for j in range(n_real)]
            durations = None
        elif is_integrate:
            refined, prenet, mel_len, durations = synthesize_integrate(
                model, variables, text, pos_text, args.max_frames,
                spk_emb=spk_emb,
                spk_emb_post=(jnp.asarray(batch["spk_emb_post"])
                              if "spk_emb_post" in batch else None),
                accent=(jnp.asarray(batch["accent"])
                        if "accent" in batch else None),
                mean=mean_j, var=var_j)
            mel = prenet if args.save_prenet else refined
            mel_np = np.asarray(mel)
            prenet_np = np.asarray(prenet)
            lens = [int(mel_len[j]) for j in range(n_real)]
            # the reference writes the prenet mel alongside (:206-210)
            for j, idx in enumerate(chunk):
                np.save(os.path.join(args.save, f"{idx}_prenet.npy"),
                        prenet_np[j, :lens[j]])
        else:
            p_scale = sample_perturbation(prng) \
                if args.pitch_perturbation else 1.0
            d_scale = sample_perturbation(prng) \
                if args.duration_perturbation else 1.0
            mel, mel_len, durations = synthesize_fastspeech2(
                model, variables, text, pos_text, args.max_frames,
                use_prenet=args.use_prenet,
                spk_emb=spk_emb,
                accent=(jnp.asarray(batch["accent"])
                        if "accent" in batch else None),
                hop_size=(jnp.asarray(batch["hop_size"])
                          if "hop_size" in batch else None),
                mean=mean_j, var=var_j,
                pitch_scale=p_scale, duration_scale=d_scale)
            if post_model is not None:
                mel = _apply_post_model(
                    hp, model, variables, post_model, post_variables,
                    text, pos_text, args.max_frames, mel, mean_j, var_j)
            # float32 on disk: under amp the device mel is bf16, which
            # np.save would write as a raw 2-byte void dtype that
            # np.load cannot interpret (reference mels are float .npy)
            mel_np = np.asarray(mel, np.float32)
            lens = [int(mel_len[j]) for j in range(n_real)]
        elapsed += time.time() - t0

        for j, idx in enumerate(chunk):
            n = lens[j]
            out_name = os.path.join(args.save, f"{idx}.npy")
            np.save(out_name, mel_np[j, :n])
            if durations is not None:
                np.save(os.path.join(args.save, f"{idx}_alignment.npy"),
                        np.asarray(durations[j]))
            if args.wav and n > 0:
                _write_wav(os.path.join(args.save, f"{idx}.wav"),
                           mel_np[j, :n], hp, args.sample_rate,
                           args.hop_length, vocoder=vocoder,
                           buckets=hp.length_buckets,
                           n_fft=args.n_fft)
            print(f"save {out_name} ({n} frames)")
        sys.stdout.flush()

    print(f"elapsed time = {elapsed}")
    print(f"total time = {time.time() - start_time}")


def _write_wav(path, mel, hp, sample_rate, hop_length, *, vocoder=None,
               buckets=(), n_fft=1024):
    """Vocode the de-normalized log-mel (neural generator when given,
    Griffin-Lim fallback) and write a 16-bit WAV."""
    import wave
    import jax.numpy as jnp
    if vocoder is not None:
        from transformer_tts_tpu.data.batching import pick_bucket
        gen, gen_apply, gen_vars = vocoder
        n = mel.shape[0]
        # pad T to a bucket so repeated calls reuse one compiled program
        t = pick_bucket(n, buckets) if buckets else n
        mel_pad = np.zeros((1, t, mel.shape[1]), np.float32)
        mel_pad[0, :n] = mel
        audio = np.asarray(gen_apply(
            gen_vars, jnp.asarray(mel_pad)))[0, : n * gen.hop_length]
    else:
        from transformer_tts_tpu.ops.melspectrogram import (
            griffin_lim_from_log_mel)
        audio = np.asarray(griffin_lim_from_log_mel(
            jnp.asarray(mel, jnp.float32), sample_rate=sample_rate,
            n_fft=n_fft, hop_length=hop_length, n_mels=hp.mel_dim))
    pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(path, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sample_rate)
        fh.writeframes(pcm.tobytes())


def _apply_post_model(hp, model, variables, post_model, post_variables,
                      text, pos_text, max_frames, mel, mean_j, var_j):
    """FS2 -> PostLowEnergy refinement (test_fastspeech2_dev.py:207-227)."""
    import jax.numpy as jnp
    from transformer_tts_tpu.ops.masks import pad_mask
    # re-run the FS2 forward in normalized space to get phone features
    src_mask = pad_mask(pos_text)
    out = model.apply(variables, text, src_mask, max_frames, train=False)
    input_mel = out.mel_post if hp.postnet_pred else out.mel_pre
    if hp.version in (1, 5):
        post = post_model.apply(post_variables, input_mel, out.mel_mask,
                                train=False)
    else:
        phone = (out.text_dur_predicted if hp.version in (4, 6)
                 else out.variance_adaptor_output)
        post, _, _ = post_model.apply(post_variables, input_mel,
                                      out.mel_mask, phone, train=False)
    if hp.version in (3, 5, 6):          # residual
        refined = input_mel.at[:, :, : hp.mel_dim_post].add(post)
    else:                                # replace dims 0:mel_dim_post
        refined = input_mel.at[:, :, : hp.mel_dim_post].set(post)
    if mean_j is not None:
        from transformer_tts_tpu.infer.synthesize import denormalize
        refined = denormalize(refined, mean_j, var_j)
    return refined


if __name__ == "__main__":
    main()
