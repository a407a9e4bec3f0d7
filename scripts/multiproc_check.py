"""Multi-process distributed evidence artifact.

Launches 2 OS processes (tests/multiproc_worker.py) that rendezvous via
``jax.distributed.initialize`` on the CPU backend (4 virtual devices
each = 8 global), trains 3 steps over the global mesh, re-runs the same
global batches single-process on an 8-device mesh, and writes
``MULTIPROC_r03.json`` with both results and the parity delta — the
multi-process analogue of the driver's MULTICHIP artifact.

Run from the repo root: ``python scripts/multiproc_check.py``
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multiproc_worker.py")

    with tempfile.TemporaryDirectory() as td:
        procs = []
        for pid in range(2):
            out = os.path.join(td, f"w{pid}.json")
            procs.append((subprocess.Popen(
                [sys.executable, worker, "--process_id", str(pid),
                 "--num_processes", "2", "--port", str(port),
                 "--out", out, "--steps", "3"],
                env=env, cwd=REPO), out))
        multi = []
        for p, out in procs:
            p.communicate(timeout=600)
            assert p.returncode == 0, f"worker exit code {p.returncode}"
            with open(out) as f:
                multi.append(json.load(f))

        # single-process 8-device reference in a fresh child (same
        # platform forcing rules as the workers)
        single_out = os.path.join(td, "single.json")
        code = (
            "import os, re, json; "
            "os.environ['XLA_FLAGS'] = "
            "'--xla_force_host_platform_device_count=8'; "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.path.insert(0, 'tests'); "
            "from multiproc_worker import build_global_batches, build_hp, "
            "run_steps, summarize; "
            "from transformer_tts_tpu.parallel.mesh import "
            "make_global_batch, make_mesh, replicate_global; "
            "from transformer_tts_tpu.train.trainer import "
            "init_fastspeech2_state, make_fastspeech2_train_step; "
            "hp = build_hp(); "
            "model, state = init_fastspeech2_state(hp, "
            "jax.random.PRNGKey(0)); "
            "mesh = make_mesh(); "
            "state = replicate_global(state, mesh); "
            "step_fn = make_fastspeech2_train_step(model, hp, "
            "donate=False); "
            "arrays = [make_global_batch(gb, mesh) for gb in "
            "build_global_batches(hp, 3)]; "
            "state, logs = run_steps(state, step_fn, arrays, hp); "
            f"json.dump(summarize(state, logs), open({single_out!r}, 'w'))"
        )
        subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       check=True, timeout=600)
        with open(single_out) as f:
            single = json.load(f)

    rel = abs(multi[0]["loss_total"] - single["loss_total"]) / abs(
        single["loss_total"])
    artifact = {
        "ok": bool(rel < 2e-5
                   and multi[0]["loss_total"] == multi[1]["loss_total"]),
        "mode": "2 OS processes x 4 virtual CPU devices, "
                "jax.distributed.initialize rendezvous",
        "steps": 3,
        "multiprocess": multi,
        "single_process_8dev": single,
        "loss_rel_delta_vs_single": rel,
    }
    path = os.path.join(REPO, "MULTIPROC_r03.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    assert artifact["ok"], "multi-process parity failed"


if __name__ == "__main__":
    main()
