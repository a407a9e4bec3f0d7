"""Worker for the true multi-process distributed test.

Launched N times by ``tests/test_multiprocess.py`` (and by
``scripts/multiproc_check.py``), each as its own OS process with 4
virtual CPU devices; the processes rendezvous through
``jax.distributed.initialize`` exactly like the reference's
``mp.spawn`` workers rendezvous through an NCCL process group
(train_fastspeech2.py:352-374). Each worker:

* initializes distributed JAX (coordinator = localhost:<port>),
* builds the identical FastSpeech2 state from the same seed (the DDP
  broadcast-from-rank0 equivalent — deterministic init replaces the
  broadcast),
* feeds its DISJOINT slice of every global batch
  (``make_global_batch``; DistributedSamplerWrapper contract,
  datasets_fastspeech2.py:847-919),
* runs jitted train steps over the global 2x4-device mesh (gradient
  all-reduce = XLA collective over the process boundary),
* writes final loss / param-norm to a JSON file for the parent to
  compare against a single-process 8-device run of the same batches.
"""

from __future__ import annotations

import argparse
import json
import os
import re


def build_hp():
    from transformer_tts_tpu.config import HParams
    return HParams(
        d_model_encoder=32, d_model_decoder=32, n_layer_encoder=1,
        n_layer_decoder=1, n_head_encoder=2, n_head_decoder=2,
        vocab_size=30, mel_dim=8, amp=False, batch_size=8,
        warmup_step=10, warmup_factor=5.0)


def build_global_batches(hp, n_steps: int):
    """Deterministic global batches — every process derives the same."""
    import numpy as np
    batches = []
    for s in range(n_steps):
        rs = np.random.RandomState(100 + s)
        b, l, t = 8, 12, 36
        batches.append({
            "text": rs.randint(1, hp.vocab_size, (b, l)).astype(np.int32),
            "pos_text": np.tile(np.arange(1, l + 1, dtype=np.int32)[None],
                                (b, 1)),
            "mel": rs.randn(b, t, hp.mel_dim).astype(np.float32),
            "pos_mel": np.tile(np.arange(1, t + 1, dtype=np.int32)[None],
                               (b, 1)),
            "alignment": np.full((b, l), t // l, np.int32),
            "f0": (rs.rand(b, t) * 300).astype(np.float32),
            "energy": (rs.rand(b, t) * 100).astype(np.float32),
        })
    return batches


def run_steps(state, step_fn, arrays_list, hp):
    import jax
    rng = jax.random.key(hp.seed + 1, impl=hp.prng_impl)
    logs = None
    for arrays in arrays_list:
        state, logs = step_fn(state, arrays, rng)
    return state, logs


def compile_and_sync(step_fn, state, arrays, hp, name):
    """AOT-compile the step locally, then line every process up at the
    coordination-service barrier (configurable timeout) before the
    first Gloo collective executes. Without this, a contended host can
    skew the per-process compiles past Gloo's fixed ~30 s connect
    timeout and the whole run dies in context initialization."""
    import jax
    from jax._src import distributed
    rng = jax.random.key(hp.seed + 1, impl=hp.prng_impl)
    compiled = step_fn.lower(state, arrays, rng).compile()
    distributed.global_state.client.wait_at_barrier(
        name, timeout_in_ms=900_000)
    return compiled


def summarize(state, logs):
    import optax
    return {
        "loss_total": float(logs["loss_total"]),
        "loss_frame_before": float(logs["loss_frame_before"]),
        "param_norm": float(optax.global_norm(state.params)),
        "step": int(state.step),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument("--ckpt_dir", type=str, default=None,
                    help="after --steps: rank 0 saves epoch 1, every "
                         "process restores into a FRESH differently-"
                         "seeded state and continues --resume_steps "
                         "more (the distributed save->resume path)")
    ap.add_argument("--resume_steps", type=int, default=2)
    a = ap.parse_args()

    # own virtual-device count (strip any inherited forcing first)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{a.devices_per_process}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{a.port}",
        num_processes=a.num_processes, process_id=a.process_id)
    assert jax.process_count() == a.num_processes
    assert jax.local_device_count() == a.devices_per_process
    assert jax.device_count() == a.num_processes * a.devices_per_process

    from transformer_tts_tpu.parallel.mesh import (
        make_global_batch, make_mesh, replicate_global)
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = build_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate_global(state, mesh)
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)

    # local slice: global row r lives on global device r; this process
    # owns devices [pid*dpp, (pid+1)*dpp)
    b_local = 8 // a.num_processes
    lo = a.process_id * b_local
    arrays_list = [
        make_global_batch(
            {k: v[lo: lo + b_local] for k, v in gb.items()}, mesh)
        for gb in build_global_batches(hp, a.steps)]
    step_fn = compile_and_sync(step_fn, state, arrays_list[0], hp,
                               "compiled")
    state, logs = run_steps(state, step_fn, arrays_list, hp)

    if a.ckpt_dir:
        # distributed save -> restore -> continue (cli/train semantics:
        # rank-0-only save of the host-snapshotted replicated state;
        # every process restores from local disk and re-replicates)
        import time
        from transformer_tts_tpu.train import checkpoint as ckpt
        if jax.process_index() == 0:
            ckpt.save_checkpoint(a.ckpt_dir, jax.device_get(state), 1)
        # filesystem barrier: orbax commits the epoch dir atomically
        path = os.path.join(a.ckpt_dir, "epoch_1")
        deadline = time.time() + 300
        while not os.path.isdir(path):
            if time.time() > deadline:
                raise TimeoutError("checkpoint never appeared")
            time.sleep(0.5)
        # a fresh DIFFERENTLY-seeded state: the continuation below can
        # only match the in-memory trajectory if restore is faithful
        _, fresh = init_fastspeech2_state(hp, jax.random.PRNGKey(123))
        restored, _ = ckpt.restore_checkpoint(a.ckpt_dir, fresh)
        restored = replicate_global(restored, mesh)
        # line up again: restores can skew under host contention too
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            "restored", timeout_in_ms=900_000)
        resume = [
            make_global_batch(
                {k: v[lo: lo + b_local] for k, v in gb.items()}, mesh)
            for gb in build_global_batches(
                hp, a.steps + a.resume_steps)[a.steps:]]
        state, logs = run_steps(restored, step_fn, resume, hp)

    result = summarize(state, logs)
    result["process_id"] = a.process_id
    result["process_count"] = jax.process_count()
    result["global_devices"] = jax.device_count()
    with open(a.out, "w") as f:
        json.dump(result, f)
    print("WORKER_OK", json.dumps(result))


if __name__ == "__main__":
    main()
