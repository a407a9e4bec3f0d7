"""Teacher-forcing mel generation (reference generate_teacher_forcing.py).

Runs FastSpeech2 over the TRAIN script with ground-truth durations and
writes ``*_gen.npy`` mels next to the originals — creating the mel-mel
training corpus for the post-processing line
(generate_teacher_forcing.py:131-177).

``--variance predicted`` goes beyond the reference: the teacher embeds
its own pitch/energy predictions instead of the ground-truth targets,
so the corpus matches the SERVING distribution (cli/synthesize uses
predicted variance; a student trained on ground-truth-variance teacher
mels sees near-perfect inputs at train time and systematically worse
ones at synthesis time — the round-4 free-run regression).

``python -m transformer_tts_tpu.cli.teacher_forcing --load_name <dir>``
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_name", type=str, required=True)
    parser.add_argument("--hp_file", type=str, default=None)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--suffix", type=str, default="_gen")
    parser.add_argument("--out_dir", type=str, default=None,
                        help="write here instead of next to sources")
    parser.add_argument("--save_phone", action="store_true",
                        help="also save per-frame phone features as "
                             "{stem}{suffix}_phone.npy — required by "
                             "mel-mel student versions outside (1, 5) "
                             "when training from the pregenerated "
                             "corpus (hp.teacher_suffix)")
    parser.add_argument("--variance", choices=("target", "predicted"),
                        default="target",
                        help="pitch/energy fed to the teacher: 'target' "
                             "= ground truth (reference "
                             "generate_teacher_forcing.py semantics); "
                             "'predicted' = the teacher's own "
                             "predictions, i.e. the SERVING "
                             "distribution — a student trained on this "
                             "corpus sees the same teacher errors at "
                             "train time that it must correct at "
                             "synthesis time (durations stay "
                             "ground-truth so the corpus remains "
                             "frame-aligned with the targets)")
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.data import TTSDataset, collate
    from transformer_tts_tpu.data.readers import Normalizer
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_eval_step)

    load_dir = args.load_name
    hp_dir = os.path.dirname(load_dir) if os.path.basename(
        load_dir).startswith(("epoch_", "average_")) else load_dir
    hp = load_hparams(args.hp_file or os.path.join(hp_dir, "hparams.py"))

    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng)
    variables = ckpt.restore_variables(load_dir, state, epoch=args.epoch)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          vq_stats=variables["vq_stats"])
    eval_fn = make_fastspeech2_eval_step(model, hp)

    normalizer = Normalizer(hp.mean_file, hp.var_file, hp.mel_dim)
    dataset = TTSDataset(hp.train_script, hp)
    for idx in range(len(dataset)):
        sample = dataset[idx]
        batch = collate([sample], hp, pad_batch=False)
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.ndim > 0}
        if args.variance == "predicted":
            # drop the targets -> the variance adaptor embeds its OWN
            # pitch/energy predictions (the inference branch), keeping
            # ground-truth durations for frame alignment
            arrays.pop("f0", None)
            arrays.pop("energy", None)
        out, _ = eval_fn(state, arrays)
        n = int(batch["mel_length"][0])
        # float32 on disk (device mel is bf16 under amp; raw bf16 .npy
        # is unreadable — see cli/synthesize.py)
        mel = np.asarray(
            (out.mel_post if out.mel_post is not None else out.mel_pre)
            [0, :n], np.float32)
        mel = normalizer.denormalize(mel)
        src = sample["mel_name"]
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            dest = os.path.join(
                args.out_dir,
                os.path.basename(src).replace(
                    ".npy", args.suffix + ".npy"))
        else:
            dest = src.replace(".npy", args.suffix + ".npy")
        np.save(dest, mel)
        if args.save_phone:
            # the phone feature the student consumes at this version
            # (train_fastspeech2_dev.py: text_dur_predicted for v4/6,
            # the variance-adaptor output otherwise)
            phone = (out.text_dur_predicted if hp.version in (4, 6)
                     else out.variance_adaptor_output)
            np.save(dest.replace(".npy", "_phone.npy"),
                    np.asarray(phone[0, :n], np.float32))
        print(f"save {dest}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
