"""Checkpointing via orbax: the reference's snapshot taxonomy.

Equivalent of solver_3dvlp.py:1137-1245 / train_3dvlp.py:160-171:
`checkpoint` (train state + best dict, every 10 epochs + at finish),
best-model snapshots model / ground_model / ground_model_25 /
ground_model_5 / caption_model / epoch_50 / model_last.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


def _path(root: str, name: str) -> str:
    return os.path.join(os.path.abspath(root), name)


# One shared StandardCheckpointer (an AsyncCheckpointer underneath): saves
# return once the tree is staged host-side and commit on a background
# thread, overlapping the epoch-boundary snapshot writes with the next
# training epoch. Orbax commits to a tmp dir and renames atomically, so a
# crash mid-commit leaves the previous snapshot intact.
_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_until_finished() -> None:
    """Join any in-flight async snapshot commit (call before process exit
    and before reading a just-written snapshot)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_params(root: str, name: str, params, batch_stats=None) -> None:
    """Best-model snapshot. Like the reference's model.state_dict() .pth
    files, it carries the BN running stats alongside the params.

    Asynchronous: returns after staging; the commit overlaps training.
    """
    tree = {"params": params}
    if batch_stats is not None:
        tree["batch_stats"] = batch_stats
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # serialize with any in-flight save
    ckptr.save(_path(root, name), tree, force=True)


def _restore_host(path: str):
    """Template-free restore to HOST numpy leaves, regardless of the
    devices the snapshot was written from. StandardCheckpointer.restore
    with no target replays the SAVED shardings, whose device names don't
    exist across platforms (a snapshot written on a CPU box dies on TPU
    with "Device TFRT_CPU_0 was not found" and vice versa) — but
    import/export/serve/warm-start all shard or device_put downstream
    anyway, so host arrays are the right intermediate."""
    import numpy as np

    ptc = ocp.PyTreeCheckpointer()
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
        ptc.metadata(path).item_metadata,
    )
    return ptc.restore(path, restore_args=restore_args)


def load_params(root: str, name: str):
    """Restore a save_params snapshot: {'params': ..., 'batch_stats': ...}
    (batch_stats absent in params-only snapshots). Leaves are host numpy
    arrays — platform-portable (see _restore_host)."""
    wait_until_finished()  # serialize with any in-flight save
    saved = _restore_host(_path(root, name))
    if not isinstance(saved, dict) or "params" not in saved:
        saved = {"params": saved}
    return saved


def load_params_partial(path: str, params):
    """strict=False warm start (train_3dvlp.py:115-121): restore the
    save_params snapshot at `path` (e.g. <run>/model_last) and merge every
    leaf that exists in the template tree `params` with a matching
    shape/dtype; everything else keeps its fresh init. Pass
    {'params': ..., 'batch_stats': ...} as the template to warm-start BN
    stats too. Returns (merged, n_restored, n_skipped)."""
    wait_until_finished()
    saved = _restore_host(path)
    if not isinstance(saved, dict) or (
        "params" in params and "params" not in saved
    ):
        saved = {"params": saved}

    flat_saved = _flatten(saved)
    n_restored = 0
    n_skipped = 0

    def merge(tree, prefix):
        nonlocal n_restored, n_skipped
        if isinstance(tree, dict):
            return {k: merge(v, prefix + (k,)) for k, v in tree.items()}
        loaded = flat_saved.get(prefix)
        if (
            loaded is not None
            and getattr(loaded, "shape", None) == getattr(tree, "shape", ())
            and str(getattr(loaded, "dtype", "")) == str(tree.dtype)
        ):
            n_restored += 1
            return jax.numpy.asarray(loaded)
        n_skipped += 1
        return tree

    merged = merge(params, ())
    return merged, n_restored, n_skipped


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _live_ckpt_dir(root: str) -> str:
    """Name of the committed resume-checkpoint dir per checkpoint_meta
    ('checkpoint' for pre-A/B snapshots without a 'dir' key)."""
    meta_path = os.path.join(root, "checkpoint_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f).get("dir", "checkpoint")
    return "checkpoint"


def save_checkpoint(root: str, state, best: dict, epoch: int) -> None:
    """Resume checkpoint: synchronous — checkpoint_meta.json must only
    ever describe a fully committed state tree.

    A/B alternation: save(force=True) DELETES the target dir before
    serializing, so writing the live dir in place would let a hard kill
    (SIGKILL at the preemption grace deadline) landing mid-save destroy
    the last good checkpoint — the exact scenario --auto_resume exists
    for. Instead each save goes to the non-live slot (checkpoint_a /
    checkpoint_b) and checkpoint_meta.json flips to name it only after
    the commit completes; a kill at ANY instant leaves the previous
    meta + its fully-committed dir intact."""
    live = _live_ckpt_dir(root)
    target = "checkpoint_b" if live == "checkpoint_a" else "checkpoint_a"
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(_path(root, target), state, force=True)
    ckptr.wait_until_finished()
    meta = {
        "epoch": epoch,
        "best": jax.tree_util.tree_map(float, best),
        "dir": target,
    }
    tmp = os.path.join(root, "checkpoint_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "checkpoint_meta.json"))


def load_checkpoint(root: str, state_template):
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    with open(os.path.join(root, "checkpoint_meta.json")) as f:
        meta = json.load(f)
    state = ckptr.restore(
        _path(root, meta.get("dir", "checkpoint")), state_template
    )
    return state, meta
