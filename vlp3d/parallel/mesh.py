"""Device mesh + sharding rules.

TPU-native replacement for the reference's DataParallel/NCCL scaffolding
(train_3dvlp.py:124-126, utils/dist.py:6-46; see SURVEY §2.7): one jitted
program sharded over an ICI mesh. Batch-leading arrays shard over the
'data' axis; parameters and scalars replicate; XLA/GSPMD inserts the
gradient psums and cross-replica BatchNorm reductions automatically.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and
the same code spans DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(batch_size: int) -> Mesh:
    """Data mesh over the largest device count that divides batch_size."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n)


def batch_sharding(mesh: Mesh, batch_size: int):
    """Pytree-of-shardings for a batch dict: leading-axis sharding for
    arrays whose first dim is the batch, replication for scalars/others."""
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return data
        return repl

    return spec


# batch keys the compiled train/eval steps actually consume; everything
# else (host-side eval bookkeeping: corner labels — float64 (...,8,3)
# arrays whose device layout is pathological — object/ann ids, breakdown
# masks) stays on host.
DEVICE_BATCH_KEYS = frozenset(
    {
        "point_clouds", "input_ids", "bert_attention_mask", "lang_num",
        "center_label", "heading_class_label", "heading_residual_label",
        "size_class_label", "size_residual_label", "sem_cls_label",
        "box_label_mask", "vote_label", "vote_label_mask",
        "instance_labels", "ref_center_label_list",
        "ref_heading_class_label_list", "ref_heading_residual_label_list",
        "ref_size_class_label_list", "ref_size_residual_label_list",
        "object_cat_list", "answer_cat", "answer_cats",
        "answer_cat_scores", "lang_feat", "lang_len", "epoch", "istrain",
        "random",
    }
)


def shard_batch(mesh: Mesh, batch: dict, *, device_keys=DEVICE_BATCH_KEYS) -> dict:
    """Device-put the step-consumed subset of a host batch dict with
    data-parallel sharding."""
    bs = batch["point_clouds"].shape[0]
    spec = batch_sharding(mesh, bs)
    return {
        k: jax.device_put(v, spec(v))
        for k, v in batch.items()
        if k in device_keys
    }


def replicate(mesh: Mesh, tree):
    repl = NamedSharding(mesh, P())
    return jax.device_put(tree, repl)
