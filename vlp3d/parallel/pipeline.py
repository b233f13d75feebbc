"""Pipeline parallelism (GPipe-style microbatching) over the text encoder.

The reference has no pipeline axis at all (its largest module, the frozen
BERT encoder, is replicated per GPU by ``torch.nn.DataParallel``,
train_3dvlp.py:124-126).  For the TPU rebuild the natural pipeline target
is the one homogeneous deep stack in the model: the BERT text layers
``layer_0 .. layer_{fusion_layer-1}`` (models/bert.py:176-207, mirroring
xbert.py:550-558 'text' mode).  Each stage of a ``pipe``-axis mesh holds
``fusion_layer / n_stages`` consecutive layers (the stacked layer axis is
sharded with ``P('pipe')``, so stage memory really is 1/n_stages of the
encoder), and microbatches flow stage-to-stage over ICI via
``lax.ppermute``.

Schedule: classic GPipe.  With M microbatches and S stages the jitted
``lax.scan`` runs ``T = M + S - 1`` ticks; at tick ``t`` stage ``s``
processes microbatch ``j = t - s`` (garbage in the warm-up/drain bubble
ticks is computed but never written out — uniform SPMD control flow, no
data-dependent branching).  Bubble fraction is ``(S-1)/T``.  The backward
pass is the autodiff transpose: ``jax.grad`` through the scan reverses the
tick order and transposes each ``ppermute``, yielding the mirrored drain
schedule without a hand-written 1F1B implementation.

Composes with the data axis: microbatches are laid out ``(M, mb, seq, h)``
and the ``mb`` dim can be sharded over ``data``, giving a dp x pp mesh in
one ``shard_map`` (exercised by ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vlp3d.models.bert import BertConfig, BertEmbeddings, BertLayer
from vlp3d.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def stack_text_layer_params(encoder_params: dict, num_layers: int):
    """Stack ``layer_0 .. layer_{num_layers-1}`` subtrees of a
    BertTextEncoder param dict along a new leading axis (the axis a
    ``pipe`` mesh dim shards).  All text layers share one pytree
    structure, so this is a plain per-leaf ``jnp.stack``.

    NOTE: this materializes the full stack on the default device — fine
    for tests and encoders that fit one chip.  For the
    too-big-for-one-chip regime use :func:`stack_text_layer_params_sharded`,
    which builds each stage's slice directly on its stage devices."""
    layers = [encoder_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stack_text_layer_params_sharded(
    mesh: Mesh, encoder_params: dict, num_layers: int
):
    """Like :func:`stack_text_layer_params`, but each device receives
    ONLY its pipe-stage slice (``jax.make_array_from_callback`` with a
    ``P('pipe')`` sharding assembles the global stacked array from
    per-shard pieces) — no full unsharded copy ever exists on any single
    device, so stage HBM really is 1/n_stages of the encoder."""
    sharding = NamedSharding(mesh, P(PIPE_AXIS))
    layers = [encoder_params[f"layer_{i}"] for i in range(num_layers)]

    def make(*leaves):
        np_leaves = [np.asarray(x) for x in leaves]
        shape = (num_layers,) + np_leaves[0].shape

        def shard_piece(idx):
            lo, hi, _ = idx[0].indices(num_layers)
            return np.stack(np_leaves[lo:hi])

        return jax.make_array_from_callback(shape, sharding, shard_piece)

    return jax.tree.map(make, *layers)


def unstack_text_layer_params(stacked) -> dict:
    """Inverse of :func:`stack_text_layer_params` (e.g. to feed pipeline
    gradients back into the flat ``layer_i`` optimizer layout)."""
    num_layers = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"layer_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def build_pipeline(
    mesh: Mesh,
    config: BertConfig,
    num_layers: int,
    num_microbatches: int,
):
    # normalize to positional before the cache so keyword callers share
    # the same entry (lru_cache keys kwargs separately)
    return _build_pipeline_cached(mesh, config, num_layers, num_microbatches)


@functools.lru_cache(maxsize=32)
def _build_pipeline_cached(
    mesh: Mesh,
    config: BertConfig,
    num_layers: int,
    num_microbatches: int,
):
    """Build the jit-stable pipelined text-layer apply for ``mesh``.

    Returns ``run(stacked_params, x, mask) -> hidden`` where

    - ``stacked_params``: leaves ``(num_layers, ...)``, sharded
      ``P('pipe')`` on the leading axis (each stage holds its slice);
    - ``x``: ``(B, seq, hidden)`` embedded hidden states;
    - ``mask``: ``(B, seq)`` attention mask (1/0);
    - result: ``(B, seq, hidden)`` after all ``num_layers`` layers,
      bit-comparable to the sequential layer loop (same per-layer ops in
      the same order; only the schedule differs).

    ``B`` must divide into ``num_microbatches`` equal microbatches, whose
    batch dim is additionally sharded over ``data`` when the mesh has a
    data axis.  lru_cached so the shard_map closure identity is stable
    across calls (a rebuilt closure would force a re-trace per call).
    """
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' axis")
    n_stages = mesh.shape[PIPE_AXIS]
    if num_layers % n_stages != 0:
        raise ValueError(f"{num_layers} layers not divisible by {n_stages} stages")
    has_data = DATA_AXIS in mesh.axis_names
    mb_spec = DATA_AXIS if has_data else None
    layer = BertLayer(config)
    M = num_microbatches
    T = M + n_stages - 1

    def apply_stage(local_layers, h, mask):
        # consecutive layers of this stage, scanned over the local slice
        def one(h, p):
            return layer.apply({"params": p}, h, mask), None

        return lax.scan(one, h, local_layers)[0]

    def body(local_layers, xs, masks):
        # xs: (M, mb_local, seq, hidden); masks: (M, mb_local, seq)
        s = lax.axis_index(PIPE_AXIS)
        # the carry becomes pipe-varying inside the loop (it depends on
        # the stage index), so its initial value must be typed varying
        # for shard_map's scan vma check
        state0 = lax.pcast(jnp.zeros_like(xs[0]), (PIPE_AXIS,), to="varying")
        outbuf0 = lax.pcast(jnp.zeros_like(xs), (PIPE_AXIS,), to="varying")

        def tick(carry, t):
            state, outbuf = carry
            j = t - s  # microbatch index at this stage this tick
            jc = jnp.clip(j, 0, M - 1)
            # stage 0 reads the input stream; later stages consume what
            # the previous stage ppermuted over last tick
            inp = jnp.where(
                s == 0, lax.dynamic_index_in_dim(xs, jc, 0, keepdims=False), state
            )
            mask_mb = lax.dynamic_index_in_dim(masks, jc, 0, keepdims=False)
            y = apply_stage(local_layers, inp, mask_mb)
            recv = lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(n_stages - 1)]
            )
            # only the last stage's in-window results are real
            valid = (s == n_stages - 1) & (j >= 0) & (j < M)
            cur = lax.dynamic_index_in_dim(outbuf, jc, 0, keepdims=False)
            outbuf = lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, y, cur), jc, 0
            )
            return (recv, outbuf), None

        (_, outbuf), _ = lax.scan(tick, (state0, outbuf0), jnp.arange(T))
        # replicate the last stage's buffer across the pipe axis
        is_last = (s == n_stages - 1).astype(outbuf.dtype)
        return lax.psum(outbuf * is_last, PIPE_AXIS)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(None, mb_spec), P(None, mb_spec)),
        out_specs=P(None, mb_spec),
    )

    dsize = mesh.shape[DATA_AXIS] if has_data else 1

    def run(stacked_params, x, mask):
        b, seq, hidden = x.shape
        if b % M != 0:
            raise ValueError(f"batch {b} not divisible by {M} microbatches")
        if (b // M) % dsize != 0:
            raise ValueError(
                f"microbatch size {b // M} (batch {b} / {M} microbatches) "
                f"not divisible by the data-axis size {dsize}"
            )
        xs = x.reshape(M, b // M, seq, hidden)
        masks = mask.astype(x.dtype).reshape(M, b // M, seq)
        out = sharded(stacked_params, xs, masks)
        return out.reshape(b, seq, hidden)

    return run


def pipeline_text_encoder(
    mesh: Mesh,
    config: BertConfig,
    encoder_params: dict,
    input_ids,
    attention_mask,
    *,
    num_microbatches: int = 4,
):
    """Embeddings + pipelined text layers: the pp equivalent of
    ``BertTextEncoder.apply(..., mode='text')`` (models/bert.py:185-199).

    Embeddings (a lookup + LayerNorm, negligible next to the layer stack)
    run replicated outside the pipeline; layers run staged.  Intended for
    the dryrun and as the production shape for deeper text encoders; the
    canonical 6-layer frozen BERT fits one chip, so single-chip serving
    does not need this path.
    """
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' axis")
    stacked = stack_text_layer_params_sharded(
        mesh, encoder_params, config.fusion_layer
    )
    x = BertEmbeddings(config).apply(
        {"params": encoder_params["embeddings"]}, input_ids
    )
    run = build_pipeline(mesh, config, config.fusion_layer, num_microbatches)
    return run(stacked, x, attention_mask)
