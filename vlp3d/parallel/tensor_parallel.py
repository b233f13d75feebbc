"""Tensor parallelism over a 2D (data, model) mesh.

The reference has no TP (SURVEY §2.7); on TPU it is nearly free to add:
annotate the weight shardings and GSPMD inserts the collectives. The
rules follow the Megatron pattern — column-parallel first matmul
(output dim sharded, bias sharded), row-parallel second matmul (input
dim sharded, its output all-reduced by GSPMD), applied to:

  * BERT encoder layers: query/key/value + FFN intermediate are
    column-parallel, attention output + FFN output row-parallel (the
    12 attention heads split across the model axis via GSPMD's reshape
    propagation);
  * caption decoder FFNs;
  * match module cross-attention FFNs.

Everything else (PointNet++ convs, heads, BN) is replicated — those ops
are batch-bound, not weight-bound. Activations are left to GSPMD
propagation; the batch stays sharded over the data axis only.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# (path regex, spec). First match wins; no match -> replicated.
TP_RULES: list[tuple[str, P]] = [
    # BERT / xbert text encoder (column-parallel QKV + intermediate)
    (r".*/(query|key|value|intermediate)/kernel$", P(None, MODEL_AXIS)),
    (r".*/(query|key|value|intermediate)/bias$", P(MODEL_AXIS)),
    (r".*/(attention_output|output)/kernel$", P(MODEL_AXIS, None)),
    # caption decoder FFN
    (r".*/ffn1/kernel$", P(None, MODEL_AXIS)),
    (r".*/ffn1/bias$", P(MODEL_AXIS)),
    (r".*/ffn2/kernel$", P(MODEL_AXIS, None)),
    # match-module cross-attention FFN (Dense_0 -> Dense_1)
    (r".*cross_attn_\d+/ffn/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r".*cross_attn_\d+/ffn/Dense_0/bias$", P(MODEL_AXIS)),
    (r".*cross_attn_\d+/ffn/Dense_1/kernel$", P(MODEL_AXIS, None)),
]


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """(data, model) mesh over the first n_data*n_model devices."""
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    return Mesh(
        np.asarray(devices).reshape(n_data, n_model),
        (DATA_AXIS, MODEL_AXIS),
    )


def _spec_for(path: str, leaf, n_model: int) -> P:
    for pattern, spec in TP_RULES:
        if re.match(pattern, path):
            # only shard when the sharded dim divides evenly; fall back
            # to replication otherwise (tiny test configs)
            dims = tuple(spec)
            ok = True
            for axis, name in enumerate(dims):
                if name == MODEL_AXIS and (
                    axis >= leaf.ndim or leaf.shape[axis] % n_model
                ):
                    ok = False
            if ok:
                return spec
            return P()
    return P()


def param_pspecs(params, n_model: int):
    """PartitionSpec pytree for a param tree (TP_RULES by path)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        _spec_for(
            "/".join(str(k.key) for k in path), leaf, n_model
        )
        for path, leaf in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(mesh: Mesh, params):
    """device_put each param with its TP sharding (replicated otherwise)."""
    n_model = mesh.shape[MODEL_AXIS]
    specs = param_pspecs(params, n_model)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
    )


def shard_state(mesh: Mesh, state):
    """TrainState with TP-sharded params; step/batch_stats/opt_state
    replicated (the optimizer moments mirror the param tree but masking
    makes spec-matching brittle; replication costs ~2x param bytes,
    negligible at this model size — GSPMD still runs the matmuls TP)."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=shard_params(mesh, state.params),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
