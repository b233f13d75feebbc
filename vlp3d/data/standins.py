"""Synthetic stand-in assets shaped like the real downloads.

The full-accuracy validation runbook (vlp3d-validate) is asset-gated:
HF BERT weights, preprocessed ScanNet scenes, and ScanRefer/ScanQA
jsons are downloads this environment cannot make. These writers produce
stand-ins with the REAL assets' exact layouts (HF state_dict key names,
the preprocess npy column order, the annotation json schemas —
`lang_bert_module.py:34`, `lib/joint/dataset.py:598-601`,
ScanRefer_filtered_val.json fields) so that:

  * tests/test_validate_cli.py proves every runbook check executes, and
  * `vlp3d-validate --synthetic_standins DIR` can be re-run each round
    (VERDICT r03 item 8) — if the runbook rots, the round artifact
    shows it before a machine with real assets ever does.
"""

from __future__ import annotations

import json
import os

import numpy as np

SCENE = "scene0000_00"


def write_bert_assets(bert_dir, hidden: int = 32, layers: int = 2) -> None:
    """vocab.txt + HF-layout pytorch_model.bin (tiny dims, seeded)."""
    import torch

    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "a", "chair",
        "table", "brown", "wooden", "next", "to", "round", "gray", "couch",
        "against", "wall", "white", "refrigerator", "standing", "from",
        "left", "it", "is", "with", "an", "on", "this", "2nd", ",", ".",
        ";", "'", "s", "##s", "##word", "unusual", "in", "of",
    ]
    with open(os.path.join(bert_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(words) + "\n")

    v, h, i, pos = len(words), hidden, 2 * hidden, 64
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "embeddings.word_embeddings.weight": t(v, h),
        "embeddings.position_embeddings.weight": t(pos, h),
        "embeddings.token_type_embeddings.weight": t(2, h),
        "embeddings.LayerNorm.weight": torch.ones(h),
        "embeddings.LayerNorm.bias": torch.zeros(h),
        "pooler.dense.weight": t(h, h),  # deliberately unconsumed
        "pooler.dense.bias": torch.zeros(h),
    }
    for layer in range(layers):
        p = f"encoder.layer.{layer}."
        for name, shape in (
            ("attention.self.query", (h, h)),
            ("attention.self.key", (h, h)),
            ("attention.self.value", (h, h)),
            ("attention.output.dense", (h, h)),
            ("intermediate.dense", (i, h)),
            ("output.dense", (h, i)),
        ):
            sd[p + name + ".weight"] = t(*shape)
            sd[p + name + ".bias"] = torch.zeros(shape[0])
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[p + ln + ".weight"] = torch.ones(h)
            sd[p + ln + ".bias"] = torch.zeros(h)
    torch.save(sd, os.path.join(bert_dir, "pytorch_model.bin"))


def write_scene_assets(scannet_data, rng, stale: bool = False) -> None:
    """One preprocessed scene: _preprocess_val / _ins_label / _sem_label /
    _aligned_bbox npys in the upstream cache's column layout (xyz,
    normals, 128-d multiview; `stale` swaps the block order to exercise
    the stale-cache guard)."""
    n = 2000
    xyz = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mv = rng.normal(0, 2, (n, 128)).astype(np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.full(n, 3, np.int64)
    bboxes = np.zeros((2, 8), np.float64)
    for k in range(2):
        c = np.array([1.5 + k, 1.5, 1.0], np.float32)
        s = np.array([1.0, 1.0, 1.0], np.float32)
        sl = slice(k * 400, (k + 1) * 400)
        xyz[sl] = c + rng.uniform(-0.5, 0.5, (400, 3)) * s
        ins[sl] = k + 1
        bboxes[k] = [*c, *s, 3 if k == 0 else 4, k]
    # concatenate AFTER the cluster writes so the saved cloud contains
    # the instances its labels/bboxes describe
    blocks = [xyz, mv, normals] if stale else [xyz, normals, mv]
    pc = np.concatenate(blocks, axis=1)
    np.save(os.path.join(scannet_data, f"{SCENE}_preprocess_val.npy"), pc)
    np.save(os.path.join(scannet_data, f"{SCENE}_ins_label.npy"), ins)
    np.save(os.path.join(scannet_data, f"{SCENE}_sem_label.npy"), sem)
    np.save(os.path.join(scannet_data, f"{SCENE}_aligned_bbox.npy"), bboxes)
    return {"xyz": xyz, "normals": normals, "mv": mv, "ins": ins,
            "sem": sem, "bboxes": bboxes}


def write_scene_assets_nomv(nomv_dir, arrays) -> str:
    """The multiview-as-hdf5 flavor of the same scene: a 6-column
    (xyz, normals) preprocess npy plus `enet_feats_maxpool.hdf5` holding
    the per-point 128-d block under the scene_id key — the layout the
    reference's task-variant datasets consume (lib/configs/config.py:45,
    lib/vqa/dataset.py:967-990). Appending the hdf5 features to the npy
    must reproduce the baked [xyz, normal, multiview] cache
    bit-for-bit. Returns the hdf5 path."""
    import h5py

    pc = np.concatenate([arrays["xyz"], arrays["normals"]], axis=1)
    np.save(os.path.join(nomv_dir, f"{SCENE}_preprocess_val.npy"), pc)
    np.save(os.path.join(nomv_dir, f"{SCENE}_ins_label.npy"), arrays["ins"])
    np.save(os.path.join(nomv_dir, f"{SCENE}_sem_label.npy"), arrays["sem"])
    np.save(os.path.join(nomv_dir, f"{SCENE}_aligned_bbox.npy"),
            arrays["bboxes"])
    hdf5_path = os.path.join(nomv_dir, "enet_feats_maxpool.hdf5")
    with h5py.File(hdf5_path, "w") as f:
        f.create_dataset(SCENE, data=arrays["mv"])
    return hdf5_path


def write_scanqa(scanqa_dir) -> None:
    qa = [
        {
            "scene_id": SCENE, "question_id": f"val-{SCENE}-{k}",
            "question": q, "answers": a,
            "object_ids": [0], "object_names": ["chair"],
        }
        for k, (q, a) in enumerate([
            ("what color is the chair", ["brown"]),
            ("where is the table", ["next to the chair", "center"]),
            ("how many chairs are there", ["2"]),
        ])
    ]
    with open(os.path.join(scanqa_dir, "ScanQA_v1.0_val.json"), "w") as f:
        json.dump(qa, f)


def write_scanrefer(scanrefer_dir) -> None:
    anns = [
        {
            "scene_id": SCENE, "object_id": str(oid),
            "object_name": name, "ann_id": str(k),
            "description": text, "token": text.split(),
        }
        for k, (oid, name, text) in enumerate([
            (0, "chair", "the brown wooden chair next to the table"),
            (0, "chair", "a chair standing against the wall"),
            (1, "table", "the round table in the wall"),
        ])
    ]
    with open(
        os.path.join(scanrefer_dir, "ScanRefer_filtered_val.json"), "w"
    ) as f:
        json.dump(anns, f)


def write_standin_assets(root: str, seed: int = 7) -> dict:
    """All four asset families under `root`; returns the dir map the
    vlp3d-validate flags expect."""
    rng = np.random.default_rng(seed)
    paths = {
        "bert_dir": os.path.join(root, "bert"),
        "scannet_data": os.path.join(root, "scannet_data"),
        "scanrefer_dir": os.path.join(root, "scanrefer"),
        "scanqa_dir": os.path.join(root, "scanqa"),
    }
    paths["multiview_nomv_data"] = os.path.join(root, "scannet_data_nomv")
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    write_bert_assets(paths["bert_dir"])
    arrays = write_scene_assets(paths["scannet_data"], rng)
    write_scene_assets_nomv(paths["multiview_nomv_data"], arrays)
    write_scanrefer(paths["scanrefer_dir"])
    write_scanqa(paths["scanqa_dir"])
    return paths
