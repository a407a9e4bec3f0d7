"""Unified training CLI.

``python -m transformer_tts_tpu.cli.train --hp_file hparams.py``

Dispatch (reference architecture asserts, train_fastspeech2.py:466,
train_fastspeech2_dev.py:402, train_fastspeech2_dev_integrate_train.py:434):

  architecture=text-mel,  model=Fastspeech2  -> FastSpeech2 trainer
  architecture=text-mel,  model=Transformer  -> AR Transformer-TTS trainer
  architecture=mel-mel                       -> frozen-teacher PostLowEnergy
  architecture=text-mel-mel                  -> joint integrate training

Epoch-based loop with per-step loss prints (the reference's observability
contract), Noam LR inside the optimizer, per-epoch orbax checkpoints with
the reference retention policy, resume via hp.loaded_dir/loaded_epoch,
hparams snapshot into save_dir. Data-parallel over all available devices
via a 1-D mesh; per-host batch sharding by process index.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a TTS model (TPU)")
    parser.add_argument("--hp_file", type=str, required=True)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="debug: stop after N steps")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="hparams override (reference "
                             "overwrite_hparams equivalent)")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize() for multi-host "
                             "pods (the mp.spawn/NCCL-rendezvous "
                             "equivalent, train_fastspeech2.py:352-374)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (TPU pods "
                             "auto-detect; required for CPU/GPU multi-"
                             "process, the MASTER_ADDR/MASTER_PORT "
                             "equivalent of train_fastspeech2.py:357-362)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    # persistent XLA compile cache: restarts/resumes skip the multi-
    # minute train-step compiles (same cache the tests/bench share)
    from transformer_tts_tpu.bench_utils import enable_compilation_cache
    enable_compilation_cache()
    if args.multihost:
        # explicit rendezvous when given (CPU/GPU backends); TPU pods
        # auto-detect all three from the platform
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    import jax.numpy as jnp
    from transformer_tts_tpu.config import load_hparams
    from transformer_tts_tpu.data import TTSDataset, DataLoader
    from transformer_tts_tpu.parallel.mesh import (
        make_mesh, make_global_batch, replicate_global)
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import (
        build_fastspeech2, init_fastspeech2_state, init_transformer_state,
        init_sq_fastspeech2_state, make_fastspeech2_train_step,
        make_transformer_train_step, make_sq_fastspeech2_train_step)
    from transformer_tts_tpu.train.post_trainers import (
        init_post_state, make_meltomel_train_step,
        make_integrate_train_step)

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

    if hp.debug_nans:
        # the reference's NaN asserts + anomaly-detection residue
        # (train_fastspeech2.py:162,300) as a first-class switch
        jax.config.update("jax_debug_nans", True)

    arch = hp.architecture
    assert arch in ("text-mel", "mel-mel", "text-mel-mel"), arch
    is_sq = hp.model.lower() in ("sqfastspeech2", "sq_fastspeech2",
                                 "fastspeech2_sq")
    is_ar = not is_sq and hp.model.lower() not in ("fastspeech2",
                                                   "lightspeech")

    rng = jax.random.PRNGKey(hp.seed)
    dataset = TTSDataset(hp.train_script, hp,
                         alignment_pred=not is_ar)
    n_local_devices = jax.local_device_count()
    loader = DataLoader(dataset, hp,
                        shard=jax.process_index(),
                        num_shards=jax.process_count(),
                        num_workers=hp.num_workers,
                        batch_multiple=n_local_devices)

    # ---- model + step ----
    if arch == "text-mel" and is_sq:
        model, state = init_sq_fastspeech2_state(hp, rng)
        step_fn = make_sq_fastspeech2_train_step(model, hp)
    elif arch == "text-mel" and not is_ar:
        model, state = init_fastspeech2_state(hp, rng)
        step_fn = make_fastspeech2_train_step(model, hp)
    elif arch == "text-mel" and is_ar:
        model, state = init_transformer_state(hp, rng)
        step_fn = make_transformer_train_step(model, hp)
    elif arch == "mel-mel" and hp.teacher_suffix:
        # pregenerated teacher corpus (cli/teacher_forcing): no teacher
        # restore, no teacher forward in the step — the reference's
        # generate_teacher_forcing.py -> train_fastspeech2_dev.py flow
        from transformer_tts_tpu.train.post_trainers import (
            make_meltomel_pregen_train_step)
        model, state = init_post_state(hp, rng, None)
        step_fn = make_meltomel_pregen_train_step(model, hp)
    elif arch == "mel-mel":
        assert hp.pretrain_model is not None, \
            "mel-mel training needs hp.pretrain_model (frozen teacher) " \
            "or hp.teacher_suffix (pregenerated corpus)"
        teacher = build_fastspeech2(hp)
        _, t_state = init_fastspeech2_state(hp, rng)
        # the teacher runs frozen at eval — its BatchNorm running stats
        # must be the trained ones (restore_variables, not params-only)
        teacher_variables = ckpt.restore_variables(
            hp.pretrain_model, t_state)
        model, state = init_post_state(hp, rng, teacher)
        step_fn = make_meltomel_train_step(teacher, teacher_variables,
                                           model, hp)
    else:  # text-mel-mel
        model, state = init_fastspeech2_state(hp, rng,
                                              enable_post_model=True)
        step_fn = make_integrate_train_step(model, hp)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    print(f"params = {n_params / 1e6:.2f}M")

    # ---- pretrain / resume ----
    start_epoch = 0
    if arch != "mel-mel" and hp.pretrain_model is not None:
        restored = ckpt.restore_variables(hp.pretrain_model, state)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              vq_stats=restored["vq_stats"])
        print(f"loaded pretrain params from {hp.pretrain_model}")
    if hp.loaded_epoch is not None:
        load_dir = hp.loaded_dir or hp.save_dir
        state, start_epoch = ckpt.restore_checkpoint(
            load_dir, state, epoch=hp.loaded_epoch)
        print(f"resumed from {load_dir} epoch {start_epoch} "
              f"(step {int(state.step)})")

    # ---- mesh ----
    mesh = make_mesh()
    # replicated everywhere; in multi-process runs every process built the
    # identical state from the same seed (the DDP broadcast equivalent)
    state = replicate_global(state, mesh)
    # typed key carries the PRNG impl through fold_in/split; 'rbg'
    # (default) halves step cost vs threefry (dropout-mask generation
    # dominates — scripts/profile_train.py ablation)
    step_rng = jax.random.key(hp.seed + 1, impl=hp.prng_impl)

    # ---- observability ----
    from transformer_tts_tpu.utils import MetricsLogger, StepTimer
    import os as _os
    metrics = MetricsLogger(_os.path.join(hp.save_dir, hp.log_dir))
    timer = StepTimer()

    image_fn = None
    if hp.tb_images and arch == "text-mel" and not is_ar and not is_sq:
        # attention maps + pred/target mel images (train.py:227-234's
        # intended workflow): one collect_attn eval forward per dump
        from transformer_tts_tpu.ops.masks import create_masks as _masks

        @jax.jit
        def image_fn(state, batch):
            src_mask, mel_mask = _masks(batch["pos_text"],
                                        batch["pos_mel"],
                                        model="fastspeech2")
            out = model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats,
                 "vq_stats": state.vq_stats},
                batch["text"], src_mask, batch["mel"].shape[1],
                batch["alignment"], batch.get("f0"), batch.get("energy"),
                mel_mask=mel_mask, spk_emb=batch.get("spk_emb"),
                accent=batch.get("accent"),
                hop_size=batch.get("hop_size"),
                train=False, collect_attn=True)
            mel_img = (out.mel_post if out.mel_post is not None
                       else out.mel_pre)
            return (out.attn_enc[0, 0, 0].astype(jnp.float32),
                    out.attn_dec[0, 0, 0].astype(jnp.float32),
                    mel_img[0].T.astype(jnp.float32))

    def dump_images(step, state, arrays, batch):
        enc_a, dec_a, mel_pred = jax.device_get(image_fn(state, arrays))
        metrics.log_image(step, "attention/encoder_l0_h0", enc_a)
        metrics.log_image(step, "attention/decoder_l0_h0", dec_a)
        metrics.log_image(step, "mel/predicted", mel_pred)
        metrics.log_image(step, "mel/target",
                          np.asarray(batch["mel"][0]).T)
    if hp.profile_dir:
        from transformer_tts_tpu.utils import start_profiler
        start_profiler(hp.profile_dir)

    # ---- preemption safety (no reference equivalent; SURVEY.md §5
    # notes the reference has no failure recovery at all) ----
    import signal
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        print(f"signal {signum}: checkpointing and stopping...")
        stop_requested["flag"] = True
    try:
        signal.signal(signal.SIGTERM, _request_stop)
        signal.signal(signal.SIGINT, _request_stop)
    except ValueError:
        pass   # non-main thread (tests)

    # ---- epoch loop ----
    global_step = int(state.step)

    def emit(pending):
        """Print/record one step's logs. float() is the device sync: it
        runs AFTER the next step has been dispatched (one-step-lagged
        logging), so the host transfer overlaps device execution and
        per-step prints (the reference's observability contract,
        train_fastspeech2.py:242-299) no longer serialize the chip."""
        p_epoch, p_step, p_t0, p_logs = pending
        parts = " ".join(
            f"{k}={float(v):.4f}" for k, v in sorted(p_logs.items())
            if np.ndim(v) == 0)
        print(f"epoch {p_epoch + 1} step {p_step} {parts} "
              f"({time.time() - p_t0:.3f}s)")
        sys.stdout.flush()
        metrics.log(p_step, steps_per_sec=timer.steps_per_sec,
                    **{k: v for k, v in p_logs.items() if np.ndim(v) == 0})
        loss = float(p_logs["loss_total"])
        if not np.isfinite(loss):
            # the mel-mel trainer SKIPS non-finite steps in-graph
            # (post_trainers.py NaN-skip, train_fastspeech2_dev.py:
            # 234-246) — count and surface them instead of silently
            # printing nans forever; a permanently-NaN run still dies
            if arch != "mel-mel":
                raise AssertionError("loss is nan")
            nan_skips["total"] += 1
            nan_skips["consecutive"] += 1
            print(f"skipped NaN step ({nan_skips['total']} total, "
                  f"{nan_skips['consecutive']} consecutive)")
            assert nan_skips["consecutive"] < 50, (
                f"{nan_skips['consecutive']} consecutive NaN steps — "
                "the run is permanently non-finite")
        else:
            nan_skips["consecutive"] = 0

    pending = None
    nan_skips = {"total": 0, "consecutive": 0}
    for epoch in range(start_epoch, hp.max_epoch):
        t_epoch = time.time()
        for batch in loader:
            t0 = time.time()
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray) and v.ndim > 0}
            arrays = make_global_batch(arrays, mesh)
            state, logs = step_fn(state, arrays, step_rng)
            global_step += 1
            timer.tick()
            if (image_fn is not None
                    and global_step % hp.save_attention_per_step == 0):
                dump_images(global_step, state, arrays, batch)
            if pending is not None:
                emit(pending)
            pending = ((epoch, global_step, t0, logs)
                       if global_step % hp.log_every == 0 else None)
            if stop_requested["flag"]:
                break
            if args.max_steps and global_step >= args.max_steps:
                break
        if pending is not None:       # drain before epoch-end checkpoint
            emit(pending)
            pending = None
        if jax.process_index() == 0:
            if ckpt.should_save(epoch + 1, hp.max_epoch, hp.save_per_epoch):
                # async: host-snapshot now, write to disk while the next
                # epoch trains (wait_for_saves below before exiting)
                ckpt.save_checkpoint(
                    hp.save_dir, state, epoch + 1,
                    with_optimizer=(epoch + 1) % hp.save_per_epoch == 0,
                    block=False)
        print(f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s")
        if stop_requested["flag"]:
            if jax.process_index() == 0:
                ckpt.save_checkpoint(hp.save_dir, state, epoch + 1)
                print(f"preemption checkpoint saved at epoch {epoch + 1}")
            break
        if args.max_steps and global_step >= args.max_steps:
            break
    if hp.profile_dir:
        from transformer_tts_tpu.utils import stop_profiler
        stop_profiler()
    metrics.close()
    ckpt.wait_for_saves()
    print("training finished")


if __name__ == "__main__":
    main()
