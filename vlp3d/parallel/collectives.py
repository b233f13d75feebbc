"""Cross-device collectives for contrastive training.

TPU-native replacement for the reference's `concat_all_gather`
(utils/utils_fn.py:10-21 — written for cross-rank contrastive negatives,
never exercised because the reference only ever ran DataParallel). Here
it is a first-class primitive: inside a shard_map'd (or pjit-sharded)
step, `gather_negatives` all-gathers the per-device positives so every
device contrasts against the GLOBAL batch, which is what makes
data-parallel contrastive training match single-device semantics at the
same global batch size.

Gradients flow through all_gather (its transpose is psum_scatter), so
this is safe inside the loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.parallel.mesh import DATA_AXIS


def gather_negatives(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """(local_B, ...) -> (global_B, ...) by all-gathering over the data
    axis. Call inside shard_map/psum context (axis_name bound)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def make_sharded_contrastive_step(mesh: Mesh, loss_fn):
    """Wrap a contrastive loss_fn(local_emb_a, local_emb_b, global_b) so
    each device computes logits against the all-gathered global
    embeddings. loss_fn receives (local_a, global_b) and returns a
    scalar; the result is psum-averaged over devices."""
    from jax import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )
    def step(a, b):
        global_b = gather_negatives(b)
        loss = loss_fn(a, global_b)
        return jax.lax.pmean(loss, DATA_AXIS)

    return step
