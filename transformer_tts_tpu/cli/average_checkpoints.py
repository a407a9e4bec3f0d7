"""Checkpoint averaging CLI (reference average_checkpoints.py:9-63).

``python -m transformer_tts_tpu.cli.average_checkpoints \
      --save_dir <dir> --start_epoch A --end_epoch B [--hp_file h.py]``

Averages params over the epoch range into
``<save_dir>/average_epoch{A}-epoch{B}`` (reference naming:
``network.average_epoch{A}-epoch{B}``). With ``--last N`` averages the
newest N epochs instead (the reference's mtime-based variant).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--hp_file", type=str, default=None)
    parser.add_argument("--start_epoch", type=int, default=None)
    parser.add_argument("--end_epoch", type=int, default=None)
    parser.add_argument("--last", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, init_transformer_state)

    hp_file = args.hp_file or os.path.join(args.save_dir, "hparams.py")
    hp = load_hparams(hp_file)
    rng = jax.random.PRNGKey(0)
    if hp.model.lower() in ("fastspeech2", "lightspeech"):
        _, state = init_fastspeech2_state(hp, rng)
    else:
        _, state = init_transformer_state(hp, rng)

    epochs = ckpt.list_epochs(args.save_dir)
    if not epochs:
        raise SystemExit(f"no checkpoints under {args.save_dir}")
    if args.last is not None:
        chosen = epochs[-args.last:]
        start, end = chosen[0], chosen[-1]
    else:
        start = args.start_epoch if args.start_epoch is not None \
            else epochs[0]
        end = args.end_epoch if args.end_epoch is not None else epochs[-1]
    _, out_path = ckpt.average_checkpoints(
        args.save_dir, start, end, state.params, state=state)
    print(f"averaged epochs [{start}, {end}] -> {out_path}")


if __name__ == "__main__":
    main()
