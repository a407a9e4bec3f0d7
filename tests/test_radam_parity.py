"""reference_radam vs the actual vendored torch RAdam (radam.py:5-93).

Steps through both optimizers with identical synthetic gradients and
asserts the parameter trajectories match — including the early
degenerated-to-SGD steps (N_sma < 5 for the first 4 steps at b2=0.999)
and the rectified branch, with and without weight decay.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _run_torch(params_np, grads_seq, lr, weight_decay):
    from radam import RAdam
    tp = [torch.nn.Parameter(torch.tensor(p, dtype=torch.float32))
          for p in params_np]
    opt = RAdam(tp, lr=lr, weight_decay=weight_decay)
    traj = []
    for grads in grads_seq:
        for p, g in zip(tp, grads):
            p.grad = torch.tensor(g, dtype=torch.float32)
        opt.step()
        traj.append([p.detach().numpy().copy() for p in tp])
    return traj


def _run_jax(params_np, grads_seq, lr, weight_decay):
    import jax.numpy as jnp
    from transformer_tts_tpu.train.schedule import reference_radam
    tx = reference_radam(lr, weight_decay=weight_decay)
    params = [jnp.asarray(p) for p in params_np]
    state = tx.init(params)
    traj = []
    for grads in grads_seq:
        g = [jnp.asarray(x) for x in grads]
        updates, state = tx.update(g, state, params)
        params = [p + u for p, u in zip(params, updates)]
        traj.append([np.asarray(p) for p in params])
    return traj


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_reference_radam_matches_torch(weight_decay):
    rs = np.random.RandomState(0)
    params = [rs.randn(5, 3).astype(np.float32),
              rs.randn(7).astype(np.float32)]
    grads_seq = [[rs.randn(*p.shape).astype(np.float32) for p in params]
                 for _ in range(12)]
    t_traj = _run_torch(params, grads_seq, lr=1e-3,
                        weight_decay=weight_decay)
    j_traj = _run_jax(params, grads_seq, lr=1e-3,
                      weight_decay=weight_decay)
    for step, (tp, jp) in enumerate(zip(t_traj, j_traj)):
        for a, b in zip(tp, jp):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                       err_msg=f"step {step + 1}")


def test_degenerated_to_sgd_false_freezes_early_steps():
    import jax.numpy as jnp
    from transformer_tts_tpu.train.schedule import reference_radam
    tx = reference_radam(1e-3, degenerated_to_sgd=False)
    p = [jnp.ones((4,))]
    state = tx.init(p)
    g = [jnp.ones((4,))]
    # N_sma < 5 until step 5 at b2=0.999 -> zero updates first
    updates, state = tx.update(g, state, p)
    assert float(jnp.abs(updates[0]).max()) == 0.0
    for _ in range(5):
        updates, state = tx.update(g, state, p)
    assert float(jnp.abs(updates[0]).max()) > 0.0
