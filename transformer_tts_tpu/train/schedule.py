"""Learning-rate schedules and optimizer construction.

* Noam: ``warmup_factor * min(step^-0.5, step * warmup^-1.5) * d_model^-0.5``
  (reference ``get_learning_rate``, utils/utils.py:204-215; applied manually
  into param groups each step at train_fastspeech2.py:117-120 — here it's an
  optax schedule, evaluated inside the jitted update).
* Optimizer selection mirrors the drivers: 'Noam' -> Adam(beta2=0.98,
  eps=1e-9 per the standard transformer recipe used with torch Adam
  defaults in the reference) driven by the Noam schedule; 'RAdam' with a
  fixed lr (train_fastspeech2.py:404-416); 'AdamW' likewise.
* Gradient clipping by global norm (hp.clip, default 1.0:
  train_fastspeech2.py:306-314).
* Gradient accumulation via optax.MultiSteps (reference hp.accum_grad,
  train.py:248-263).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import optax


def noam_schedule(d_model: int, warmup_factor: float = 1.0,
                  warmup_step: int = 4000) -> optax.Schedule:
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0  # reference steps start at 1
        return (warmup_factor * (d_model ** -0.5)
                * jnp.minimum(s ** -0.5, s * warmup_step ** -1.5))
    return schedule


def epoch_decay_factor(epoch: int, lr_adjust_epoch, 
                       reset_optimizer_epoch=None,
                       decay: float = 0.8) -> float:
    """Epoch-based LR decay factor (reference ``adjust_learning_rate``,
    utils/utils.py:136-151): multiply by 0.8 per epoch past
    ``lr_adjust_epoch`` (modulo ``reset_optimizer_epoch`` when set)."""
    if reset_optimizer_epoch is not None:
        over = max(0, (epoch % reset_optimizer_epoch) - lr_adjust_epoch)
    else:
        over = max(0, epoch - lr_adjust_epoch)
    return decay ** over


def reference_radam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    degenerated_to_sgd: bool = True,
) -> optax.GradientTransformation:
    """Exact port of the reference's vendored RAdam (radam.py:5-93).

    Differences vs ``optax.radam`` that this reproduces bit-for-bit
    (test_torch_parity.py asserts step-by-step equality vs the torch
    implementation):

    * eps is added to ``sqrt(v)`` of the UNcorrected second moment; the
      ``(1 - b2^t)`` bias correction is folded into the step size
      (radam.py:84), so the effective eps scales with 1/sqrt(1-b2^t)
      early in training;
    * below the N_sma >= 5 rectification threshold the update
      degenerates to momentum-SGD ``m / (1 - b1^t)`` (radam.py:74-77),
      or to NO update when ``degenerated_to_sgd=False``;
    * weight decay is applied to the parameter inside the same step
      (radam.py:83-91), i.e. ``update -= lr * wd * p``.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], grads)
        beta2_t = jnp.power(b2, t)
        bias1 = 1.0 - jnp.power(b1, t)
        n_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_max / (n_max - 2.0)) / bias1
        use_rect = n_sma >= 5.0
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)

        def leaf_update(m, v, p):
            adam = rect * m / (jnp.sqrt(v) + eps)
            sgd = (m / bias1) if degenerated_to_sgd else jnp.zeros_like(m)
            step = jnp.where(use_rect, adam, sgd)
            if weight_decay != 0.0 and p is not None:
                # wd applied only when a step is taken (radam.py:83-91)
                took = use_rect | bool(degenerated_to_sgd)
                step = step + jnp.where(took, weight_decay * p, 0.0)
            return -lr * step

        if params is None:
            updates = jax.tree.map(
                lambda m, v: leaf_update(m, v, None), mu, nu)
        else:
            updates = jax.tree.map(leaf_update, mu, nu, params)
        return updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


class RecipeTransform:
    """An optax transform that compares equal by construction recipe.

    ``TrainState`` stores its optimizer as STATIC pytree metadata
    (``struct.field(pytree_node=False)``); jax decides whether two
    states are the same pytree type by ``__eq__`` on that metadata. A
    raw optax transform is a NamedTuple of freshly-created closures, so
    two transforms built from IDENTICAL hparams compare unequal — an
    AOT-compiled train step (``.lower().compile()``) then rejects any
    state whose optimizer was rebuilt ("input pytree does not match",
    observed in the 2-process checkpoint-resume path where every worker
    restores into a freshly-initialized state), and plain ``jit``
    silently retraces. Wrapping with the build recipe restores value
    equality; ``init``/``update`` delegate unchanged.
    """

    def __init__(self, tx, recipe: tuple):
        self._tx = tx
        self._recipe = recipe

    def init(self, params):
        return self._tx.init(params)

    def update(self, updates, state, params=None, **extra):
        # The wrapped tx is a plain GradientTransformation (chain of
        # closures / reference_radam) whose update() takes no extra
        # kwargs — forwarding an empty **extra is fine, but forwarding
        # actual extra args (the ExtraArgs protocol) would TypeError
        # deep inside the chain. Fail with a clear message instead.
        if extra:
            raise TypeError(
                "RecipeTransform wraps a plain GradientTransformation; "
                f"extra update kwargs {sorted(extra)} are unsupported "
                "(wrap with optax.with_extra_args_support first)")
        return self._tx.update(updates, state, params)

    @property
    def inner(self):
        return self._tx

    def __eq__(self, other):
        if type(other) is not RecipeTransform:
            return NotImplemented
        return self._recipe == other._recipe

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self):
        return hash(self._recipe)

    def __repr__(self):
        return f"RecipeTransform{self._recipe!r}"


def build_optimizer(
    name: str,
    d_model: int,
    warmup_factor: float = 1.0,
    warmup_step: int = 4000,
    learning_rate: float = 1e-3,
    clip: Optional[float] = 1.0,
    accum_grad: int = 1,
) -> optax.GradientTransformation:
    recipe = ("build_optimizer", name.lower(), d_model, warmup_factor,
              warmup_step, learning_rate, clip, accum_grad)
    name = name.lower()
    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "noam":
        sched = noam_schedule(d_model, warmup_factor, warmup_step)
        chain.append(optax.adam(learning_rate=sched, b1=0.9, b2=0.98,
                                eps=1e-9))
    elif name == "radam":
        # exact reference semantics (vendored radam.py), not optax.radam
        chain.append(reference_radam(learning_rate=learning_rate))
    elif name == "adamw":
        chain.append(optax.adamw(learning_rate=learning_rate))
    elif name == "adam":
        chain.append(optax.adam(learning_rate=learning_rate))
    else:
        raise ValueError(f"unknown optimizer: {name}")
    tx = optax.chain(*chain)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return RecipeTransform(tx, recipe)


def apply_reference_init(params, rng):
    """Re-initialize params with the reference's ``init_weight`` scheme.

    utils/utils.py:153-177: Kaiming-normal for Conv1d/Conv2d/LSTM kernels,
    zero biases for those layers. (The Linear branch matches lowercase
    'linear' against class names and therefore NEVER fires in the
    reference — torch defaults apply to Linears; we likewise leave Dense
    kernels at their flax defaults.) Conv kernels are identified by rank
    (>= 3: (k..., in, out)).
    """
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for i, (path, leaf) in enumerate(flat):
        key = jax.random.fold_in(rng, i)
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_kernel = names and names[-1] == "kernel"
        if is_kernel and leaf.ndim >= 3:
            fan_in = int(np.prod(leaf.shape[:-1]))
            std = float(np.sqrt(2.0 / fan_in))
            leaves.append(std * jax.random.normal(key, leaf.shape,
                                                  leaf.dtype))
        elif names and names[-1] == "bias" and leaf.ndim == 1:
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
