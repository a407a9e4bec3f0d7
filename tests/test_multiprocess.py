"""True multi-process distributed training tests.

The reference's flagship distributed feature is MULTI-PROCESS DDP
(mp.spawn + NCCL process groups, train_fastspeech2.py:352-374,480-483).
These tests launch 2 real OS processes that rendezvous via
``jax.distributed.initialize`` (CPU backend, 4 virtual devices each =
8 global), train over the global mesh, and assert the result equals a
single-process 8-device run of the same global batches — the SPMD
equivalent of "DDP matches DataParallel".
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # let the worker set its own device count
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # share the repo's persistent compile cache (conftest.py) so reruns
    # skip the child processes' cold compiles
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    return env


def _launch_workers(port, outdir, steps=3, extra=()):
    procs = []
    for pid in range(2):
        out = os.path.join(outdir, f"worker{pid}.json")
        procs.append((subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(pid),
             "--num_processes", "2", "--port", str(port),
             "--out", out, "--steps", str(steps), *extra],
            env=_child_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True), out))
    results = []
    for p, out in procs:
        # generous: on a contended 1-core host the two children
        # serialize and can blow well past their solo time
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_process_training_matches_single_process(tmp_path):
    """2 OS processes x 4 CPU devices == 1 process x 8 CPU devices."""
    port = _free_port()
    r0, r1 = _launch_workers(port, str(tmp_path))
    assert r0["process_count"] == 2 and r0["global_devices"] == 8
    # both processes observed the identical global result
    np.testing.assert_allclose(r0["loss_total"], r1["loss_total"],
                               rtol=1e-6)
    np.testing.assert_allclose(r0["param_norm"], r1["param_norm"],
                               rtol=1e-6)

    # single-process reference on this test process's 8 virtual devices
    import jax
    from multiproc_worker import (
        build_global_batches, build_hp, run_steps, summarize)
    from transformer_tts_tpu.parallel.mesh import (
        make_global_batch, make_mesh, replicate_global)
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = build_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate_global(state, mesh)
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    arrays_list = [make_global_batch(gb, mesh)
                   for gb in build_global_batches(hp, 3)]
    state, logs = run_steps(state, step_fn, arrays_list, hp)
    single = summarize(state, logs)

    # cross-process collectives vs single-process: same math, float
    # reduction order may differ -> tight-but-not-bitwise tolerance
    np.testing.assert_allclose(r0["loss_total"], single["loss_total"],
                               rtol=2e-5)
    np.testing.assert_allclose(r0["param_norm"], single["param_norm"],
                               rtol=2e-5)
    assert r0["step"] == single["step"] == 3


# weekly tier: CLI wiring over jax.distributed; the default-tier parity test + the dryrun multiprocess stage cover the distributed math
@pytest.mark.weekly
def test_two_process_train_cli(tmp_path):
    """cli/train.py --multihost end to end on 2 processes: distributed
    init, process-index batch sharding (shard_batches), fixed-shape
    collation, and rank-0-only checkpointing."""
    rs = np.random.RandomState(0)
    mel_dim = 8
    lines = []
    for i in range(8):
        t_text = rs.randint(4, 8)
        t_mel = t_text * 3
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, mel_dim).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), 3, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                (rs.rand(t_mel) * 300).astype(np.float32))
        np.save(tmp_path / f"utt{i}_energy.npy",
                (rs.rand(t_mel) * 100).astype(np.float32))
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    save_dir = tmp_path / "ckpt"
    cfg = dict(
        architecture="text-mel", model="Fastspeech2", vocab_size=20,
        mel_dim=mel_dim, d_model_encoder=16, d_model_decoder=16,
        n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
        n_head_decoder=2, batch_size=4, max_epoch=1, save_per_epoch=1,
        warmup_step=10, amp=False, num_workers=0,
        train_script=str(tmp_path / "train.txt"),
        save_dir=str(save_dir),
        text_buckets=(8,), length_buckets=(32,),
    )
    hp_path = tmp_path / "hparams.py"
    hp_path.write_text(
        "\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")

    port = _free_port()
    env = _child_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = []
    for pid in range(2):
        log = open(tmp_path / f"proc{pid}.log", "w")
        # the axon sitecustomize overrides JAX_PLATFORMS programmatically;
        # forcing via jax.config (before backend init) wins (conftest.py)
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from transformer_tts_tpu.cli.train import main; "
            f"main(['--hp_file', {str(hp_path)!r}, '--max_steps', '2', "
            f"'--multihost', '--coordinator', 'localhost:{port}', "
            f"'--num_processes', '2', '--process_id', '{pid}'])")
        procs.append((subprocess.Popen(
            [sys.executable, "-c", code],
            env=env, cwd=REPO, stdout=log,
            stderr=subprocess.STDOUT, text=True), log))
    outs = []
    for pid, (p, log) in enumerate(procs):
        p.communicate(timeout=900)
        log.close()
        out = (tmp_path / f"proc{pid}.log").read_text()
        outs.append(out)
        assert p.returncode == 0, f"train proc failed:\n{out[-4000:]}"
    assert "training finished" in outs[0]
    # rank 0 checkpointed; exactly one epoch dir (no double-write)
    epochs = [d for d in os.listdir(save_dir) if d.startswith("epoch_")]
    assert epochs == ["epoch_1"], epochs
    # each process logged a step with a finite loss
    for out in outs:
        assert "loss_total=" in out


# weekly tier (154 s): duplicate coverage — the in-tier
# two_process_training parity test covers the distributed math and
# test_checkpoint.py::test_save_restore_roundtrip covers save/restore;
# the driver's dryrun_multichip additionally runs a 2x4 multiprocess
# step every round.
@pytest.mark.weekly
def test_two_process_checkpoint_resume_matches_inmemory(tmp_path):
    """Distributed save -> restore -> continue equals the continuous
    in-memory single-process trajectory (r3 verdict stretch #9): rank 0
    saves after 3 steps, both processes restore into a fresh
    differently-seeded state (incl. optimizer state) and run 2 more."""
    port = _free_port()
    ck = str(tmp_path / "ck")
    r0, r1 = _launch_workers(port, str(tmp_path), steps=3,
                             extra=("--ckpt_dir", ck,
                                    "--resume_steps", "2"))
    np.testing.assert_allclose(r0["loss_total"], r1["loss_total"],
                               rtol=1e-6)
    assert r0["step"] == 5

    import jax
    from multiproc_worker import (
        build_global_batches, build_hp, run_steps, summarize)
    from transformer_tts_tpu.parallel.mesh import (
        make_global_batch, make_mesh, replicate_global)
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = build_hp()
    model, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate_global(state, mesh)
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    arrays_list = [make_global_batch(gb, mesh)
                   for gb in build_global_batches(hp, 5)]
    state, logs = run_steps(state, step_fn, arrays_list, hp)
    single = summarize(state, logs)

    np.testing.assert_allclose(r0["loss_total"], single["loss_total"],
                               rtol=2e-5)
    np.testing.assert_allclose(r0["param_norm"], single["param_norm"],
                               rtol=2e-5)
    assert single["step"] == 5
