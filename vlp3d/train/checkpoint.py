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


def save_params(root: str, name: str, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    path = _path(root, name)
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(root: str, name: str, template):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_path(root, name), template)


def save_checkpoint(root: str, state, best: dict, epoch: int) -> None:
    ckptr = ocp.StandardCheckpointer()
    path = _path(root, "checkpoint")
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(root, "checkpoint_meta.json"), "w") as f:
        json.dump({"epoch": epoch, "best": jax.tree_util.tree_map(float, best)}, f)


def load_checkpoint(root: str, state_template):
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(_path(root, "checkpoint"), state_template)
    with open(os.path.join(root, "checkpoint_meta.json")) as f:
        meta = json.load(f)
    return state, meta
