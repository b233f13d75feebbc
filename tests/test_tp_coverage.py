"""TP-spec coverage: every param leaf INTENDED for Megatron sharding
actually receives a non-replicated PartitionSpec from
vlp3d.parallel.tensor_parallel.param_pspecs.

The TP rules are path-regex-driven (tensor_parallel.py TP_RULES); a
module rename would silently fall back to replication. This test finds
the intended-TP leaves STRUCTURALLY — by the shape of the param subtree,
not by path — and cross-checks them against the regex output, with
exact-count floors so a rename can't make the finder (and the test)
vacuous.
"""

import jax
import jax.tree_util as jtu
import pytest
from jax.sharding import PartitionSpec as P

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.parallel.tensor_parallel import MODEL_AXIS, param_pspecs

COL = P(None, MODEL_AXIS)  # column-parallel kernel
COL_B = P(MODEL_AXIS)  # its bias
ROW = P(MODEL_AXIS, None)  # row-parallel kernel (output all-reduced)


@pytest.fixture(scope="module")
def params():
    config = tiny_config(no_caption=False)
    batch = make_batch(config, batch_size=1, num_points=256)
    model = JointNet(config)
    vs = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, batch,
                           train=False)
    )
    return vs["params"]


def _walk(tree, path=()):
    if isinstance(tree, dict):
        yield path, tree
        for k, v in tree.items():
            yield from _walk(v, path + (k,))


def _expected_tp_leaves(params):
    """Structurally derive (path, spec) for every leaf that must be TP:
    BERT encoder layers, caption decoder FFNs, match cross-attn FFNs."""
    expected = {}
    counts = {"bert_layer": 0, "caption_layer": 0, "xattn_ffn": 0}
    for path, node in _walk(params):
        keys = set(node.keys())
        # a BERT encoder layer: col QKV+intermediate, row outputs
        if {"query", "key", "value", "intermediate", "attention_output",
                "output"} <= keys:
            counts["bert_layer"] += 1
            for name in ("query", "key", "value", "intermediate"):
                expected[path + (name, "kernel")] = COL
                expected[path + (name, "bias")] = COL_B
            for name in ("attention_output", "output"):
                expected[path + (name, "kernel")] = ROW
        # a caption decoder layer: ffn1 col, ffn2 row
        if {"ffn1", "ffn2", "self_attn"} <= keys:
            counts["caption_layer"] += 1
            expected[path + ("ffn1", "kernel")] = COL
            expected[path + ("ffn1", "bias")] = COL_B
            expected[path + ("ffn2", "kernel")] = ROW
        # a match cross-attention block: its ffn Dense pair
        if "ffn" in keys and isinstance(node["ffn"], dict) and \
                {"Dense_0", "Dense_1"} <= set(node["ffn"].keys()):
            counts["xattn_ffn"] += 1
            expected[path + ("ffn", "Dense_0", "kernel")] = COL
            expected[path + ("ffn", "Dense_0", "bias")] = COL_B
            expected[path + ("ffn", "Dense_1", "kernel")] = ROW
    return expected, counts


def test_every_intended_tp_param_gets_its_spec(params):
    expected, counts = _expected_tp_leaves(params)
    # the structural finder itself must not go vacuous: the canonical
    # JointNet has fusion_layer BERT layers, 6 caption layers, and 2
    # match cross-attention blocks
    assert counts["bert_layer"] >= 2, counts
    assert counts["caption_layer"] == 6, counts
    assert counts["xattn_ffn"] >= 2, counts
    assert len(expected) >= 2 * 9 + 6 * 3 + 2 * 3

    specs = param_pspecs(params, n_model=2)
    flat = {
        tuple(str(k.key) for k in path): spec
        for path, spec in jtu.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    }
    missing = {
        path: (want, flat.get(path))
        for path, want in expected.items()
        if flat.get(path) != want
    }
    assert not missing, (
        f"{len(missing)} intended-TP params de-sharded or mis-specced "
        f"(rename out of sync with TP_RULES?): "
        f"{dict(list(missing.items())[:10])}"
    )


def test_everything_else_is_replicated(params):
    """The inverse inventory: leaves outside the intended set must be
    replicated -- catches a regex loosened into over-matching."""
    expected, _ = _expected_tp_leaves(params)
    specs = param_pspecs(params, n_model=2)
    for path, spec in jtu.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]:
        key = tuple(str(k.key) for k in path)
        if key not in expected:
            assert spec == P(), (key, spec)


def test_indivisible_dims_fall_back_to_replication(params):
    """A model-axis size that doesn't divide the sharded dim must yield
    P() rather than a crashing spec (tiny configs, odd head counts)."""
    specs = param_pspecs(params, n_model=7)  # 128 % 7 != 0
    for _, spec in jtu.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]:
        assert spec == P()
