"""Checkpoint save / load / resume / averaging.

Reference behavior reproduced (SURVEY.md §5):

* per-epoch files; save policy = last 10 epochs always, plus a 10-epoch
  window around every ``save_per_epoch`` multiple
  (train_fastspeech2.py:316-322); optimizer state saved at
  ``save_per_epoch`` multiples only.
* resume restores model + optimizer and recovers the global step
  (train_fastspeech2.py:428-449 digs it out of Adam's state; here the step
  is stored explicitly).
* ``average_checkpoints``: arithmetic mean of an epoch range's params —
  "take an average" before synthesis (README.md:22-23,
  average_checkpoints.py:9-63). The reference's ``utils/`` copy has an
  int-division bug (utils/average_checkpoints.py:40) not replicated.
* hparams snapshot into save_dir (HParams.snapshot).

Storage: orbax StandardCheckpointer under ``save_dir/epoch_N/`` with the
pytree {params, opt_state, batch_stats, vq_stats, step, epoch}.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


def _epoch_dir(save_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(save_dir), f"epoch_{epoch}")


def list_epochs(save_dir: str) -> List[int]:
    if not os.path.isdir(save_dir):
        return []
    out = []
    for name in os.listdir(save_dir):
        m = _EPOCH_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def should_save(epoch: int, max_epoch: int, save_per_epoch: int) -> bool:
    """The reference's retention predicate (train_fastspeech2.py:316-319).

    ``epoch`` is 1-based here (the reference saves as epoch+1).
    """
    if epoch >= max_epoch - 10:
        return True
    m = epoch % save_per_epoch
    return m >= save_per_epoch - 10 or m == 0


_ASYNC_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _async_ckptr() -> ocp.StandardCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        if jax.process_count() > 1:
            # rank-0-only saving (cli/train.py guards on process_index 0;
            # the payload is host-snapshotted replicated data): restrict
            # orbax's internal barriers to process 0 so the save does not
            # block on processes that never call it
            _ASYNC_CKPTR = ocp.StandardCheckpointer(
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0}))
        else:
            _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(save_dir: str, state, epoch: int, *,
                    with_optimizer: bool = True,
                    block: bool = True) -> str:
    """Save TrainState for ``epoch`` (1-based).

    ``block=False`` overlaps the disk write with the next epoch's
    training: the payload is snapshotted to HOST memory synchronously
    first (the train step donates the device buffers, so orbax must not
    read them after this call returns), then serialized/written by
    orbax's async machinery. Call :func:`wait_for_saves` before exiting
    or restoring.
    """
    path = _epoch_dir(save_dir, epoch)
    ckptr = _async_ckptr()
    ckptr.wait_until_finished()            # one in-flight save at a time
    if os.path.exists(path):
        shutil.rmtree(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "vq_stats": state.vq_stats,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int32),
    }
    if with_optimizer:
        payload["opt_state"] = state.opt_state
    if not block:
        payload = jax.device_get(payload)  # decouple from donated buffers
    ckptr.save(path, payload)
    if block:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(save_dir: str, state, epoch: Optional[int] = None):
    """Restore into a template TrainState; returns (state, epoch).

    Missing opt_state (epochs outside save_per_epoch multiples) keeps the
    template's fresh optimizer — same as the reference, which can only
    resume the optimizer from save_per_epoch multiples.
    """
    wait_for_saves()                       # don't race an in-flight save
    epochs = list_epochs(save_dir)
    if not epochs:
        raise FileNotFoundError(f"no checkpoints under {save_dir}")
    epoch = epoch if epoch is not None else epochs[-1]
    path = _epoch_dir(save_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "vq_stats": state.vq_stats,
        "step": state.step,
        "epoch": np.asarray(0, np.int32),
        "opt_state": state.opt_state,
    }
    try:
        restored = ckptr.restore(path, template)
        opt_state = restored["opt_state"]
    except Exception:
        template.pop("opt_state")
        restored = ckptr.restore(path, template)
        opt_state = state.opt_state
    new_state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        vq_stats=restored["vq_stats"], step=restored["step"],
        opt_state=opt_state)
    return new_state, int(restored["epoch"])


def _resolve_path(path_or_dir: str, epoch: Optional[int]) -> str:
    path = path_or_dir
    if epoch is not None or not os.path.basename(
            path_or_dir).startswith(("epoch_", "average_")):
        epochs = list_epochs(path_or_dir)
        if epochs:
            e = epoch if epoch is not None else epochs[-1]
            path = _epoch_dir(path_or_dir, e)
    return path


def restore_params(path_or_dir: str, params_template,
                   epoch: Optional[int] = None):
    """Params-only restore (pretrain loading / synthesis).

    NOTE: models with running statistics (conformer/GST BatchNorm,
    SQ-VAE codebook EMAs) must use :func:`restore_variables` at
    inference — pairing restored params with init-time ``batch_stats``
    silently mis-normalizes every BatchNorm at eval.
    """
    wait_for_saves()
    path = _resolve_path(path_or_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": params_template}
    restored = ckptr.restore(
        path, template,
        # tolerate payloads with extra keys (full checkpoints)
        # StandardCheckpointer restores by template structure; extra
        # on-disk keys are ignored only with partial restore:
    ) if _is_params_only(path) else _restore_subtree(path, template)
    return restored["params"]


def restore_variables(path_or_dir: str, state,
                      epoch: Optional[int] = None) -> dict:
    """Restore the full inference variable dict from a checkpoint.

    Returns ``{"params", "batch_stats", "vq_stats"}`` with every key
    that exists on disk restored and the rest taken from the template
    ``state`` (fresh init). The torch reference restores the whole
    ``state_dict`` — params AND BatchNorm running stats — in one call
    (test_fastspeech2.py:49-52); this is that contract for the
    synthesis/serving side. Legacy params-only averaged snapshots fall
    back to init statistics with a warning (re-run
    ``cli.average_checkpoints`` to regenerate them with stats).
    """
    wait_for_saves()
    path = _resolve_path(path_or_dir, epoch)
    out = {"params": None, "batch_stats": state.batch_stats,
           "vq_stats": state.vq_stats}
    full = ocp.PyTreeCheckpointer().restore(path)
    out["params"] = jax.tree.map(
        lambda t, _: t, _follow(full["params"], state.params),
        state.params)
    for k in ("batch_stats", "vq_stats"):
        tmpl = getattr(state, k)
        if not jax.tree.leaves(tmpl):
            continue                       # model keeps no such stats
        if isinstance(full, dict) and full.get(k):
            out[k] = jax.tree.map(
                lambda t, _: t, _follow(full[k], tmpl), tmpl)
        else:
            import warnings
            warnings.warn(
                f"{path} is a params-only snapshot but the model has "
                f"running statistics ({k}); using init-time statistics. "
                "Regenerate the snapshot with cli.average_checkpoints "
                "to carry them.")
    # Commit to the default device: snapshots written from host trees
    # (device_get + no sharding file) restore as numpy, and a host tree
    # passed to a jitted forward re-uploads every weight on every call.
    return jax.device_put(out)


def _is_params_only(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "params")) and not os.path.isdir(
        os.path.join(path, "opt_state")) and not os.path.isdir(
        os.path.join(path, "step"))


def _restore_subtree(path: str, template):
    ckptr = ocp.PyTreeCheckpointer()
    full = ckptr.restore(path)
    return {"params": jax.tree.map(
        lambda t, _: t,
        _follow(full["params"], template["params"]), template["params"])}


def _follow(restored, template):
    """Align a raw-restored dict to the template tree structure."""
    if isinstance(template, dict):
        return {k: _follow(restored[k], template[k]) for k in template}
    return restored


def prune_checkpoints(save_dir: str, current_epoch: int, max_epoch: int,
                      save_per_epoch: int) -> None:
    """Delete epochs the reference policy would never have written.

    (The reference never deletes — it simply doesn't write most epochs.
    We save every epoch for crash safety and prune older ones down to the
    reference's retention set, which strictly dominates it.)
    """
    for e in list_epochs(save_dir):
        if e == current_epoch:
            continue
        keep = should_save(e, max_epoch, save_per_epoch) \
            or e > current_epoch - 2
        if not keep:
            shutil.rmtree(_epoch_dir(save_dir, e), ignore_errors=True)


def average_checkpoints(save_dir: str, start_epoch: int, end_epoch: int,
                        params_template, *, state=None,
                        out_name: Optional[str] = None):
    """Mean of params over [start_epoch, end_epoch] (average_checkpoints.py).

    The reference averages the whole torch ``state_dict``, which
    includes BatchNorm running statistics (average_checkpoints.py:36-44
    iterates every state_dict key) — pass ``state`` (a TrainState
    template) to average ``batch_stats``/``vq_stats`` alongside params
    so conformer/GST snapshots stay usable at eval. With only
    ``params_template`` the snapshot is params-only (legacy behavior,
    fine for BatchNorm-free models).

    Saves under ``save_dir/average_epoch{a}-epoch{b}`` (reference naming:
    ``network.average_epoch{a}-epoch{b}``) and returns the averaged params.
    """
    wait_for_saves()
    epochs = [e for e in list_epochs(save_dir)
              if start_epoch <= e <= end_epoch]
    if not epochs:
        raise FileNotFoundError(
            f"no checkpoints in [{start_epoch}, {end_epoch}] under "
            f"{save_dir}")
    template = {"params": params_template if state is None
                else state.params}
    if state is not None:
        for k in ("batch_stats", "vq_stats"):
            if jax.tree.leaves(getattr(state, k)):
                template[k] = getattr(state, k)
    acc = None
    for e in epochs:
        full = ocp.PyTreeCheckpointer().restore(_epoch_dir(save_dir, e))
        p = {k: jax.tree.map(lambda x, _: np.asarray(x, np.float64),
                             _follow(full[k], t), t)
             for k, t in template.items()}
        acc = p if acc is None else jax.tree.map(np.add, acc, p)
    n = float(len(epochs))
    avg = jax.tree.map(
        lambda x, t: np.asarray(x / n, np.asarray(t).dtype), acc,
        template)
    out_name = out_name or f"average_epoch{start_epoch}-epoch{end_epoch}"
    out_path = os.path.join(os.path.abspath(save_dir), out_name)
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_path, avg)
    ckptr.wait_until_finished()
    return avg["params"], out_path
