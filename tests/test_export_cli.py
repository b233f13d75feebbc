"""vlp3d-export-torch CLI + the torch-free half of the round trip:
import(export(params)) must reproduce our own tree bit-for-bit (the
torch-side half — export(import(sd)) == sd — is pinned against the real
reference models in tests/test_torch_export.py, refparity tier)."""

import jax
import numpy as np
import pytest

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.models.torch_export import export_jointnet_state_dict
from vlp3d.models.torch_import import import_jointnet_state_dict
from vlp3d.train.optimizer import make_optimizer
from vlp3d.train.schedules import cosine_lr
from vlp3d.train.state import create_state


@pytest.fixture(scope="module")
def tree():
    config = tiny_config()
    batch = make_batch(config, batch_size=1, num_points=256)
    opt = make_optimizer(
        lr_schedule=lambda e, lr0: cosine_lr(e, lr0, 200),
        steps_per_epoch=10,
    )
    state = create_state(JointNet(config), opt, batch)
    return state.params, state.batch_stats


def _n_bert_layers(params):
    enc = params["lang"]["text_encoder"]
    return sum(1 for k in enc if k.startswith("layer_"))


def _prune_empty(t):
    """Drop empty dict nodes: the importer emits {} stats for modules
    that happen to have no BatchNorm under the tiny config — leaf-free,
    so structurally irrelevant to apply()."""
    if not isinstance(t, dict):
        return t
    out = {k: _prune_empty(v) for k, v in t.items()}
    return {k: v for k, v in out.items()
            if not (isinstance(v, dict) and not v)}


def _assert_trees_equal(a, b):
    a, b = _prune_empty(a), _prune_empty(b)
    ta, tb = jax.tree_util.tree_structure(a), jax.tree_util.tree_structure(b)
    assert ta == tb
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_import_of_export_is_identity(tree):
    params, stats = tree
    sd = export_jointnet_state_dict(params, stats)
    params2, stats2 = import_jointnet_state_dict(
        sd, fusion_layer=_n_bert_layers(params))
    _assert_trees_equal(params, params2)
    _assert_trees_equal(stats, stats2)


def test_export_cli_roundtrip(tree, tmp_path):
    torch = pytest.importorskip("torch")
    from vlp3d.cli.export_torch import main
    from vlp3d.train.checkpoint import save_params, wait_until_finished

    params, stats = tree
    ckpt = tmp_path / "ckpt"
    save_params(str(ckpt), "model", params, stats)
    wait_until_finished()

    out = tmp_path / "model.pth"
    assert main(["--model_dir", str(ckpt), "--out", str(out)]) == 0
    sd = torch.load(str(out), map_location="cpu", weights_only=False)
    params2, stats2 = import_jointnet_state_dict(
        sd, fusion_layer=_n_bert_layers(params))
    _assert_trees_equal(params, params2)
    _assert_trees_equal(stats, stats2)

    # --base merge: unexported keys carry through, exported ones win
    base = {"lang.text_encoder.cls.predictions.bias":
            torch.zeros(5), "vgen.conv1.weight":
            torch.full_like(sd["vgen.conv1.weight"], 7.0)}
    basep = tmp_path / "base.pth"
    torch.save(base, str(basep))
    out2 = tmp_path / "merged.pth"
    assert main(["--model_dir", str(ckpt), "--out", str(out2),
                 "--base", str(basep)]) == 0
    sd2 = torch.load(str(out2), map_location="cpu", weights_only=False)
    assert "lang.text_encoder.cls.predictions.bias" in sd2
    np.testing.assert_array_equal(sd2["vgen.conv1.weight"].numpy(),
                                  sd["vgen.conv1.weight"].numpy())


def test_export_params_only_snapshot_clear_error():
    """A params-only snapshot (no BN running stats) must fail with a
    message saying batch_stats are required, not a bare KeyError."""
    with pytest.raises(ValueError, match="batch_stats"):
        export_jointnet_state_dict({"backbone_net": {}}, {})
