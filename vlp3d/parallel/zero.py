"""ZeRO-1: optimizer-state sharding over the data axis.

The reference is DataParallel-only (SURVEY §2.7) — every rank holds a
full copy of the AdamW moments. On TPU the ZeRO-1 recipe is pure GSPMD:
annotate each moment buffer with a PartitionSpec that splits one of its
dims over the 'data' axis and let XLA partition the (elementwise) Adam
update. Each device then updates only its 1/N slice of the moments and
emits its slice of the param update; GSPMD inserts the all-gather that
rebuilds the replicated params — exactly ZeRO stage 1 (Rajbhandari et
al., 2019), expressed as shardings instead of hand-written collectives.

Memory: the moment buffers (2x trainable-param bytes for Adam, 3x with
AMSGrad's nu_max) drop to 1/N per chip. Params and grads stay
replicated (stage 1; the model here is activation-dominated, so stages
2/3 buy little for their collective cost).

Composition: specs are derived per-leaf, so this works on any mesh that
has a 'data' axis — including the 2D (data, model) TP mesh, where the
TP-replicated modules' moments shard over data while TP-sharded params'
moments keep P() (their dims rarely divide both axes; see
opt_state_pspecs). Single-process meshes only: multi-host (DCN) setups
replicate state via `distributed.replicate_global`, whose
process-local-data path doesn't cover arbitrary sharded puts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.parallel.mesh import DATA_AXIS

# moments for leaves smaller than this stay replicated: sharding a
# (128,)-bias buffer saves nothing and adds a tiny all-gather
MIN_SHARD_ELEMS = 1 << 14


def _leaf_spec(leaf, n_data: int) -> P:
    """First dim divisible by n_data gets the data axis; else replicate."""
    if not (hasattr(leaf, "ndim") and hasattr(leaf, "shape")):
        return P()
    if leaf.ndim < 1 or leaf.size < MIN_SHARD_ELEMS:
        return P()
    if jnp.issubdtype(leaf.dtype, jax.dtypes.extended):  # PRNG keys
        return P()
    for d in range(leaf.ndim):
        if leaf.shape[d] >= n_data and leaf.shape[d] % n_data == 0:
            spec = [None] * leaf.ndim
            spec[d] = DATA_AXIS
            return P(*spec)
    return P()


def opt_state_pspecs(opt_state, n_data: int):
    """PartitionSpec pytree for an optax state tree.

    Array leaves (Adam mu/nu/nu_max, schedule buffers) shard their first
    n_data-divisible dim; scalars (counts), optax.MaskedNode
    placeholders (the frozen-BERT subtree under multi_transform), and
    small buffers replicate."""
    return jax.tree.map(lambda leaf: _leaf_spec(leaf, n_data), opt_state)


def shard_opt_state(mesh: Mesh, opt_state):
    """device_put each optimizer-state leaf with its ZeRO-1 sharding."""
    n_data = mesh.shape[DATA_AXIS]
    specs = opt_state_pspecs(opt_state, n_data)

    def put(leaf, spec):
        if not hasattr(leaf, "ndim"):  # MaskedNode etc.
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, opt_state, specs)


def zero_shard_state(mesh: Mesh, state, *, param_fn=None):
    """TrainState with ZeRO-1-sharded opt_state.

    params/batch_stats/step replicate by default; pass `param_fn`
    (e.g. tensor_parallel.shard_params bound to the mesh) to compose
    with TP weight shardings on a 2D mesh."""
    repl = NamedSharding(mesh, P())
    params = (
        param_fn(state.params) if param_fn is not None
        else jax.device_put(state.params, repl)
    )
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=params,
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=shard_opt_state(mesh, state.opt_state),
    )
