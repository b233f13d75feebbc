"""vlp3d-validate: asset-gated end-to-end validation runbook.

The standing blocker on full accuracy validation is that this
environment has no real assets (no egress: HF weights, ScanNet scans,
ScanRefer/ScanQA jsons are all downloads). This CLI converts that
blocker into a zero-thought runbook: point it at whatever real assets
exist and it runs every check those assets enable, emitting a
machine-readable report:

  tokenizer_golden     our WordPiece vs HF BertTokenizer on the same
                       vocab.txt (value-exact token ids)
  bert_weight_import   torch state_dict -> flax BertTextEncoder import
                       (shape-checked), finite fixed-sentence forward,
                       unconsumed-key inventory
  scene_cache          preprocess npy loads + stale-layout guard
                       (vlp3d.data.scannet.check_preprocess_layout)
  predict_contract     one-scene grounding predict() producing the
                       benchmark pred.json records (train_3dvlp.py
                       predict(), :423-538 / benchmark contract)
  grounding_acc        Acc@0.25/0.5 of those predictions vs GT boxes
                       (random weights give ~0; meaningful with
                       --model_dir)
  caption_smoke        greedy decode -> detokenized strings -> BLEU-4/
                       CIDEr/ROUGE-L/METEOR vs the scene's GT
                       descriptions (finite-metric smoke)
  vqa_smoke            one-scene ScanQA questions through the answer
                       head -> EM@1/@10 (train_qa.py contract)
  multiview_hdf5       enet_feats_maxpool.hdf5 modality: 6-col cache +
                       hdf5 assemble bit-identically to the baked
                       [xyz, normal, multiview] cloud, flow through a
                       dataset item (lib/configs/config.py:45)
  torch_import_chain   reference-layout .pth -> vlp3d-import-torch ->
                       checkpoint dir -> predict on the imported
                       weights (the --pretrain handoff,
                       train_3dvlp.py:115-121)

Each check reports ok / fail / skipped(+reason). Exit code 1 iff any
non-skipped check fails. Reference contracts: run.sh:1,
scripts/joint_scripts/train_3dvlp.py:423-538, lang_bert_module.py:34.
"""

from __future__ import annotations

import argparse
import json
import os
import traceback


def _load_torch_state_dict(bert_dir: str) -> dict:
    import numpy as np

    bin_path = os.path.join(bert_dir, "pytorch_model.bin")
    st_path = os.path.join(bert_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors import safe_open

        out = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in sd.items()}


def _bert_config_from_state_dict(sd: dict):
    """Infer BertConfig dims from an HF checkpoint (so small stand-in
    checkpoints validate the same code path as bert-base)."""
    from vlp3d.models.bert import BertConfig

    def g(name):
        return sd[name if name in sd else "bert." + name]

    emb = g("embeddings.word_embeddings.weight")
    n_layers = 0
    while any(
        k.startswith((f"encoder.layer.{n_layers}.",
                      f"bert.encoder.layer.{n_layers}."))
        for k in sd
    ):
        n_layers += 1
    inter = g("encoder.layer.0.intermediate.dense.weight").shape[0]
    pos = g("embeddings.position_embeddings.weight").shape[0]
    hidden = emb.shape[1]
    heads = max(1, hidden // 64)
    return BertConfig(
        vocab_size=emb.shape[0], hidden_size=hidden,
        num_hidden_layers=n_layers, num_attention_heads=heads,
        intermediate_size=inter, max_position_embeddings=pos,
        fusion_layer=min(6, n_layers),
    )


def check_tokenizer_golden(args) -> dict:
    vocab = os.path.join(args.bert_dir, "vocab.txt")
    if not args.bert_dir or not os.path.exists(vocab):
        return {"status": "skipped", "reason": "no --bert_dir/vocab.txt"}
    from vlp3d.data.tokenizer import BertWordPieceTokenizer

    ours = BertWordPieceTokenizer(vocab)
    sentences = [
        "this is the brown wooden chair next to the round table .",
        "THE refrigerator, standing 2nd from the left; it's white.",
        "a gray couch against the wall with an unusualword on it",
    ]
    try:
        from transformers import BertTokenizer

        hf = BertTokenizer(vocab, do_lower_case=True)
    except Exception as exc:  # pragma: no cover - transformers missing
        enc = ours(sentences, max_length=50)
        assert int(enc["attention_mask"].sum()) > len(sentences) * 2
        return {"status": "skipped",
                "reason": f"no HF oracle ({exc!r}); round-trip sanity "
                          "only — golden comparison did not run"}
    mismatches = []
    for s in sentences:
        want = hf(s, padding="max_length", truncation=True,
                  max_length=50)["input_ids"]
        got = ours([s], max_length=50)["input_ids"][0].tolist()
        if got != list(want):
            mismatches.append({"sentence": s, "ours": got, "hf": want})
    if mismatches:
        return {"status": "fail", "mismatches": mismatches}
    return {"status": "ok", "sentences": len(sentences)}


def check_bert_weight_import(args) -> dict:
    if not args.bert_dir:
        return {"status": "skipped", "reason": "no --bert_dir"}
    has_ckpt = any(
        os.path.exists(os.path.join(args.bert_dir, f))
        for f in ("pytorch_model.bin", "model.safetensors")
    )
    if not has_ckpt:
        return {"status": "skipped",
                "reason": "no pytorch_model.bin/model.safetensors"}
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlp3d.models.bert import BertTextEncoder, load_hf_bert_params

    sd = _load_torch_state_dict(args.bert_dir)
    cfg = _bert_config_from_state_dict(sd)
    enc = BertTextEncoder(cfg)
    ids = np.zeros((1, 12), np.int32)
    ids[0, : 6] = [101 % cfg.vocab_size, 2023 % cfg.vocab_size,
                   2003 % cfg.vocab_size, 1037 % cfg.vocab_size,
                   3242 % cfg.vocab_size, 102 % cfg.vocab_size]
    mask = (ids != 0).astype(np.int32)
    variables = enc.init(jax.random.key(0), ids, mask)
    # load_hf_bert_params addresses the LangModule layout (params under
    # a 'text_encoder' child); wrap/unwrap the bare encoder tree
    wrapped = load_hf_bert_params(
        {"text_encoder": variables["params"]}, sd)
    params = wrapped["text_encoder"]
    out = enc.apply({"params": params}, ids, mask, deterministic=True)
    cls = np.asarray(out[0, 0])
    consumed = {"embeddings.", "encoder.layer.", "bert.embeddings.",
                "bert.encoder.layer."}
    unused = [
        k for k in sd
        if not any(k.startswith(p) for p in consumed)
    ]
    return {
        "status": "ok" if np.isfinite(cls).all() else "fail",
        "config": {
            "hidden": cfg.hidden_size, "layers": cfg.num_hidden_layers,
            "vocab": cfg.vocab_size, "fusion_layer": cfg.fusion_layer,
        },
        "cls_norm": float(np.linalg.norm(cls)),
        "unconsumed_keys": unused[:20],
    }


def _scene_id(args, root: str | None = None) -> str | None:
    """--scene_id, else the first scene with a preprocess cache under
    `root` (default: --scannet_data)."""
    if args.scene_id:
        return args.scene_id
    root = root if root is not None else args.scannet_data
    if not os.path.isdir(root):
        return None
    suffix = f"_preprocess_{args.split}.npy"
    for f in sorted(os.listdir(root)):
        if f.endswith(suffix):
            return f[: -len(suffix)]
    return None


def check_scene_cache(args) -> dict:
    scene = _scene_id(args)
    if scene is None:
        return {"status": "skipped", "reason": "no --scannet_data scenes"}
    from vlp3d.data.dataset import DirectorySceneSource

    src = DirectorySceneSource(args.scannet_data)
    data = src(scene, args.split)  # raises on stale layout
    pc = data["point_cloud"]
    return {
        "status": "ok", "scene_id": scene,
        "points": int(pc.shape[0]), "channels": int(pc.shape[1]),
        "boxes": int(data["instance_bboxes"].shape[0]),
    }


def _build_predict_env(args):
    """One-scene dataset + model + inference fn (shared by the predict /
    grounding / caption checks)."""
    import jax

    from vlp3d.cli.common import load_scanrefer
    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.data.dataset import (
        BatchIterator, DirectorySceneSource, ScanReferJointDataset,
        build_nyu40id2class, load_raw2label,
    )
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    scene = _scene_id(args)
    anns = [
        d for d in load_scanrefer(args.scanrefer_dir, args.split)
        if d["scene_id"] == scene
    ][: args.max_annotations]
    if not anns:
        raise ValueError(f"no ScanRefer annotations for scene {scene}")

    source = DirectorySceneSource(
        args.scannet_data)  # shared: its cache memoizes the scene load
    # derive input channels from the cache so stand-in assets work
    pc = source(scene, args.split)["point_cloud"]
    extra = pc.shape[1] - 3 + 1  # +height appended by the dataset
    config = Config(
        dataset=DatasetConfig(
            num_points=args.num_points,
            mean_size_path=args.mean_size_npz or None,
        ),
        model=ModelConfig(
            input_feature_dim=extra,
            num_proposal=args.num_proposals,
            no_caption=args.no_caption,
            use_con=False,
            lang_num_max=1,
        ),
    )
    ds = ScanReferJointDataset(
        anns,
        source,
        load_tokenizer(os.path.join(args.bert_dir, "vocab.txt")
                       if args.bert_dir else None),
        split=args.split,
        num_points=config.dataset.num_points,
        lang_num_max=1,
        use_height=True,
        mean_size_arr=config.dataset.mean_size_arr(),
        raw2label=load_raw2label(args.labels_tsv) if args.labels_tsv else {},
        nyu40id2class=(build_nyu40id2class(args.labels_tsv)
                       if args.labels_tsv else {}),
        bert_max_len=config.model.bert_seq_len,
        seed=0,
    )
    model = JointNet(config)
    batch = next(iter(BatchIterator(ds, min(4, len(ds)), drop_last=False)))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    state = create_state(model, make_optimizer(), arrays, 0)
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, "model")
        state = state.replace(
            params=snap["params"],
            batch_stats=snap.get("batch_stats", state.batch_stats),
        )

    @jax.jit
    def infer(params, batch_stats, b):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, b, train=False
        )
        keep = ("cluster_ref", "objectness_scores", "pred_center",
                "pred_size")
        return {k: out[k] for k in keep if k in out}

    return ds, model, state, infer, config, anns


def check_predict_contract(args, env) -> dict:
    import numpy as np

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.eval.box_iou import get_3d_box

    ds, model, state, infer, config, anns = env
    records = []
    for batch in BatchIterator(ds, 4, drop_last=False):
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = {k: np.asarray(v)
               for k, v in infer(state.params, state.batch_stats,
                                 arrays).items()}
        b = out["pred_center"].shape[0]
        k = out["pred_center"].shape[1]
        masks = (np.argmax(out["objectness_scores"], -1) == 1)
        conf = out["cluster_ref"].reshape(b, 1, k)
        pred = np.argmax(conf * masks[:, None, :], -1)  # (B, 1)
        for i in range(b):
            if i >= len(batch["scene_id"]):
                break
            j = int(pred[i, 0])
            bbox = get_3d_box(
                out["pred_size"][i, j], 0.0, out["pred_center"][i, j]
            )
            records.append({
                "scene_id": str(batch["scene_id"][i]),
                "object_id": int(
                    np.asarray(arrays["object_id_list"])[i, 0]),
                "ann_id": int(np.asarray(arrays["ann_id_list"])[i, 0]),
                "bbox": np.asarray(bbox).tolist(),
                "unique_multiple": int(
                    np.asarray(arrays["unique_multiple_list"])[i, 0]),
                "others": int(np.asarray(arrays["others_list"])[i, 0])
                if "others_list" in arrays else 0,
            })
    for r in records:
        assert np.asarray(r["bbox"]).shape == (8, 3), r
    # name the artifact after the report so parallel runs / round
    # archives don't collide on a bare pred.json
    out_path = os.path.splitext(os.path.abspath(args.out))[0] + "_pred.json"
    with open(out_path, "w") as f:
        json.dump(records, f)
    return {"status": "ok", "records": len(records),
            "pred_json": out_path}


def check_grounding_acc(args, env) -> dict:
    import numpy as np

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.eval.box_iou import box3d_iou, get_3d_box

    ds, model, state, infer, config, anns = env
    ious = []
    for batch in BatchIterator(ds, 4, drop_last=False):
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = {k: np.asarray(v)
               for k, v in infer(state.params, state.batch_stats,
                                 arrays).items()}
        b, k = out["pred_center"].shape[:2]
        masks = (np.argmax(out["objectness_scores"], -1) == 1)
        conf = out["cluster_ref"].reshape(b, 1, k)
        pred = np.argmax(conf * masks[:, None, :], -1)
        gt_center = np.asarray(arrays["ref_center_label_list"])[:, 0]
        mean_size = config.dataset.mean_size_arr()
        cls_ = np.asarray(arrays["ref_size_class_label_list"])[:, 0]
        res = np.asarray(arrays["ref_size_residual_label_list"])[:, 0]
        gt_size = mean_size[cls_] + res
        for i in range(min(b, len(batch["scene_id"]))):
            j = int(pred[i, 0])
            pb = get_3d_box(out["pred_size"][i, j], 0.0,
                            out["pred_center"][i, j])
            gb = get_3d_box(gt_size[i], 0.0, gt_center[i])
            iou = box3d_iou(np.asarray(pb), np.asarray(gb))
            ious.append(float(iou[0] if isinstance(iou, tuple) else iou))
    ious = np.asarray(ious)
    return {
        "status": "ok",
        "n": int(ious.size),
        "acc_at_025": float((ious >= 0.25).mean()),
        "acc_at_05": float((ious >= 0.5).mean()),
        "mean_iou": float(ious.mean()),
        "note": "random weights unless --model_dir given",
    }


def check_caption_smoke(args, env) -> dict:
    if args.no_caption:
        return {"status": "skipped", "reason": "--no_caption"}
    import numpy as np

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.eval.capeval import Bleu, Cider, Meteor, Rouge

    ds, model, state, infer, config, anns = env
    tok = load_tokenizer(os.path.join(args.bert_dir, "vocab.txt")
                         if args.bert_dir else None)
    import jax

    from vlp3d.models.caption import CaptionDecoder, greedy_decode

    batch = next(iter(BatchIterator(ds, 2, drop_last=False)))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}

    @jax.jit
    def feats_fn(params, batch_stats, b):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, b, train=False
        )
        return out["aggregated_vote_features"]

    feats = np.asarray(
        feats_fn(state.params, state.batch_stats, arrays))
    b = feats.shape[0]
    decoder = CaptionDecoder(
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_des_len + 2,
    )
    cap_vars = {"params": state.params["caption"]}
    # one caption per scene chunk: decode from the first proposal's
    # feature (smoke — the full NMS+IoU-matched pipeline is
    # vlp3d-caption-predict / vlp3d-caption-eval)
    obj_token = feats[:, :1, :]
    toks = np.asarray(
        greedy_decode(decoder, cap_vars, obj_token,
                      config.model.max_des_len))
    gts, res = {}, {}
    for i, ann in enumerate(anns[: toks.shape[0]]):
        key = f"{ann['scene_id']}|{ann['object_id']}"
        desc = ann.get("description") or " ".join(ann.get("token", []))
        gts.setdefault(key, []).append(" ".join(str(desc).lower().split()))
        if key not in res:
            res[key] = [tok.decode(toks[i])]
    metrics = {}
    for name, scorer in (("bleu4", Bleu(4)), ("cider", Cider()),
                         ("rouge", Rouge()), ("meteor", Meteor())):
        score, _ = scorer.compute_score(gts, res)
        if isinstance(score, (list, tuple)):
            score = score[-1]
        metrics[name] = float(score)
    finite = all(np.isfinite(v) for v in metrics.values())
    return {"status": "ok" if finite else "fail", "metrics": metrics,
            "note": "random weights unless --model_dir given"}


def check_vqa_smoke(args) -> dict:
    """ScanQA answer head EM@1/@10 smoke: one-scene questions through
    JointNet(use_answer=True) (train_qa.py contract; random weights
    unless --model_dir)."""
    qa_path = os.path.join(
        args.scanqa_dir, f"ScanQA_v1.0_{args.split}.json")
    if not args.scanqa_dir or not os.path.exists(qa_path):
        return {"status": "skipped",
                "reason": f"no --scanqa_dir/ScanQA_v1.0_{args.split}.json"}
    scene = _scene_id(args)
    if scene is None:
        return {"status": "skipped", "reason": "no --scannet_data scenes"}
    import jax
    import numpy as np

    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.data.dataset import BatchIterator, DirectorySceneSource
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.data.vqa_dataset import ScanQADataset, build_answer_vocab
    from vlp3d.eval.vqa import answer_accuracy
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    with open(qa_path) as f:
        qa = [q for q in json.load(f) if q["scene_id"] == scene]
    qa = qa[: args.max_annotations]
    if not qa:
        return {"status": "skipped",
                "reason": f"no ScanQA questions for scene {scene}"}
    vocab, _ = build_answer_vocab(qa)

    pc = DirectorySceneSource(args.scannet_data)(
        scene, args.split)["point_cloud"]
    config = Config(
        dataset=DatasetConfig(num_points=args.num_points,
                              mean_size_path=args.mean_size_npz or None),
        model=ModelConfig(
            input_feature_dim=pc.shape[1] - 3 + 1,
            num_proposal=args.num_proposals, no_caption=True,
            use_con=False, use_answer=True, lang_num_max=1,
            num_answers=max(len(vocab), 1),
        ),
    )
    ds = ScanQADataset(
        qa, DirectorySceneSource(args.scannet_data),
        load_tokenizer(os.path.join(args.bert_dir, "vocab.txt")
                       if args.bert_dir else None),
        answer_vocab=vocab, num_answers=max(len(vocab), 1),
        split=args.split, num_points=config.dataset.num_points,
        lang_num_max=1, use_height=True,
        mean_size_arr=config.dataset.mean_size_arr(),
        bert_max_len=config.model.bert_seq_len, seed=0,
    )
    model = JointNet(config)
    batch = next(iter(BatchIterator(ds, min(4, len(ds)),
                                    drop_last=False)))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    state = create_state(model, make_optimizer(), arrays, 0)
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, "model")
        state = state.replace(
            params=snap["params"],
            batch_stats=snap.get("batch_stats", state.batch_stats),
        )

    @jax.jit
    def infer(params, batch_stats, b):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, b, train=False
        )
        return out["answer_scores"]

    scores = infer(state.params, state.batch_stats, arrays)
    cats = np.asarray(arrays["answer_cats"]).reshape(scores.shape[0], -1)
    k = min(10, scores.shape[-1])
    acc1, acck = answer_accuracy(scores, cats, topk=k)
    acc1, acck = float(acc1), float(acck)
    ok = np.isfinite(acc1) and np.isfinite(acck)
    return {"status": "ok" if ok else "fail",
            "questions": len(qa), "answers": len(vocab),
            "em_at_1": acc1, f"em_at_{k}": acck,
            "note": "random weights unless --model_dir given"}


def check_multiview_hdf5(args) -> dict:
    """The enet_feats_maxpool.hdf5 input modality (lib/configs/config.py:45,
    consumed per-point by the task-variant datasets): a 6-column
    (xyz, normal) scene cache + the hdf5 features must assemble into the
    same [xyz, normal, multiview] cloud a baked preprocess cache carries,
    and the assembled features must flow through a dataset __getitem__."""
    import numpy as np

    from vlp3d.data.dataset import DirectorySceneSource

    root = args.multiview_nomv_data
    hdf5 = os.path.join(root, "enet_feats_maxpool.hdf5")
    if not os.path.isfile(hdf5):
        return {"status": "skipped",
                "reason": "needs --multiview_nomv_data with "
                          "enet_feats_maxpool.hdf5"}
    # scene id comes from the nomv cache itself (this check must stay
    # asset-gated on ITS assets alone, not on --scannet_data)
    scene = _scene_id(args, root=root)
    if scene is None:
        return {"status": "skipped",
                "reason": f"no *_preprocess_{args.split}.npy under "
                          f"{root}"}
    source = DirectorySceneSource(root, multiview_hdf5=hdf5)
    assembled = source(scene, args.split)["point_cloud"]
    n_mv = 128
    assert assembled.shape[1] >= 3 + n_mv, assembled.shape
    result = {"status": "ok", "columns": int(assembled.shape[1])}

    if args.scannet_data:
        baked = DirectorySceneSource(args.scannet_data)(
            scene, args.split)["point_cloud"]
        if baked.shape == assembled.shape:
            np.testing.assert_array_equal(assembled, baked)
            result["bit_identical_to_baked"] = True

    # the appended features survive the dataset's sampling/height chain
    # (needs ScanRefer annotations; without them the assembly check above
    # already validated the modality)
    from vlp3d.cli.common import load_scanrefer
    from vlp3d.data.dataset import ScanReferJointDataset
    from vlp3d.data.tokenizer import load_tokenizer

    try:
        anns = [d for d in load_scanrefer(args.scanrefer_dir, args.split)
                if d["scene_id"] == scene][:2]
    except Exception:
        anns = []
    if not anns:
        result["item_check"] = "skipped (no ScanRefer annotations)"
        return result
    ds = ScanReferJointDataset(
        anns, source,
        load_tokenizer(os.path.join(args.bert_dir, "vocab.txt")
                       if args.bert_dir else None),
        split=args.split, num_points=min(args.num_points, 512),
        lang_num_max=1, use_height=True,
        mean_size_arr=None, raw2label={}, nyu40id2class={},
        seed=0,
    )
    item = ds[0]
    pc = item["point_clouds"]
    # xyz + normal(3) + multiview(128) + height(1)
    assert pc.shape[1] == 3 + 3 + n_mv + 1, pc.shape
    assert np.isfinite(pc).all()
    # the multiview block is live data, not zero padding
    assert float(np.abs(pc[:, 6:6 + n_mv]).max()) > 0
    result["item_channels"] = int(pc.shape[1])
    return result


def check_torch_import_chain(args, env) -> dict:
    """End-to-end --pretrain consumption chain (train_3dvlp.py:115-121 /
    the vlp3d-import-torch -> --model_dir handoff): a reference-layout
    .pth on disk -> import CLI -> orbax checkpoint dir -> predict. Run
    on stand-ins so the chain's rot is visible before a machine with
    real reference checkpoints exists."""
    import subprocess
    import sys as _sys

    import jax
    import numpy as np
    import torch

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.models.torch_export import export_jointnet_state_dict
    from vlp3d.train import checkpoint as ckpt

    ds, model, state, infer, config, anns = env
    # a recognizable, NOT-fresh-init weight set: perturb one leaf so the
    # chain's identity is provable at the end
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    probe_path = ("match", "Dense_0", "kernel")
    leaf = params["match"]["Dense_0"]["kernel"]
    params["match"]["Dense_0"]["kernel"] = leaf * 1.01 + 0.001

    sd = export_jointnet_state_dict(params, state.batch_stats)
    # chain artifacts live with the generated stand-ins, else a private
    # tempdir — never the caller's cwd, a user's real asset dir, or a
    # world-shared fixed path two concurrent runs would fight over
    if args.synthetic_standins:
        tdir = os.path.join(args.synthetic_standins, "standin_torch_ckpt")
    else:
        import tempfile

        tdir = tempfile.mkdtemp(prefix="vlp3d_validate_torch_chain_")
    os.makedirs(tdir, exist_ok=True)
    pth = os.path.join(tdir, "model_last.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, pth)

    out_dir = os.path.join(tdir, "imported")
    fusion = getattr(config.model, "fusion_layer", 6)
    proc = subprocess.run(
        [_sys.executable, "-m", "vlp3d.cli.import_torch",
         "--checkpoint", pth, "--out", out_dir,
         "--fusion_layer", str(fusion)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]

    snap = ckpt.load_params(out_dir, "model")
    got = np.asarray(
        snap["params"]["match"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        got, np.asarray(params["match"]["Dense_0"]["kernel"]),
        rtol=0, atol=0)

    # ...and predict runs on the imported weights
    batch = next(iter(BatchIterator(ds, min(2, len(ds)), drop_last=False)))
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    out = infer(snap["params"],
                snap.get("batch_stats", state.batch_stats), arrays)
    conf = np.asarray(out["cluster_ref"])
    assert np.isfinite(conf).all()
    return {"status": "ok", "probe_leaf": "/".join(probe_path),
            "pth": pth, "imported_dir": out_dir,
            "pred_finite": True}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="asset-gated validation runbook (see module doc)")
    p.add_argument("--bert_dir", default="",
                   help="HF bert-base-uncased dir (vocab.txt + "
                        "pytorch_model.bin | model.safetensors)")
    p.add_argument("--scannet_data", default="",
                   help="preprocessed scenes ({scene}_preprocess_*.npy)")
    p.add_argument("--scanrefer_dir", default="",
                   help="dir with ScanRefer_filtered_{split}.json")
    p.add_argument("--scanqa_dir", default="",
                   help="dir with ScanQA_v1.0_{split}.json")
    p.add_argument("--labels_tsv", default="")
    p.add_argument("--mean_size_npz", default="")
    p.add_argument("--multiview_nomv_data", default="",
                   help="scene cache WITHOUT baked multiview plus "
                        "enet_feats_maxpool.hdf5 (the task-variant "
                        "datasets' input modality)")
    p.add_argument("--model_dir", default="",
                   help="trained vlp3d checkpoint dir (optional)")
    p.add_argument("--scene_id", default="")
    p.add_argument("--split", default="val")
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--num_proposals", type=int, default=256)
    p.add_argument("--max_annotations", type=int, default=8)
    p.add_argument("--no_caption", action="store_true")
    p.add_argument("--out", default="validate_report.json")
    p.add_argument("--synthetic_standins", default="",
                   help="generate synthetic stand-in assets (real-asset "
                        "layouts, vlp3d.data.standins) into this dir and "
                        "run every check against them — the per-round "
                        "runbook-rot guard; explicit asset flags win")
    args = p.parse_args(argv)

    if args.synthetic_standins:
        from vlp3d.data.standins import write_standin_assets

        paths = write_standin_assets(args.synthetic_standins)
        for flag, path in paths.items():
            if not getattr(args, flag):
                setattr(args, flag, path)

    from vlp3d.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    checks = {}

    def run(name, fn, *a):
        try:
            checks[name] = fn(*a)
        except Exception as exc:  # noqa: BLE001 - report, don't die
            checks[name] = {
                "status": "fail", "error": repr(exc),
                "traceback": traceback.format_exc()[-1500:],
            }

    run("tokenizer_golden", check_tokenizer_golden, args)
    run("bert_weight_import", check_bert_weight_import, args)
    run("scene_cache", check_scene_cache, args)
    run("vqa_smoke", check_vqa_smoke, args)
    if args.multiview_nomv_data:
        run("multiview_hdf5", check_multiview_hdf5, args)
    else:
        checks["multiview_hdf5"] = {
            "status": "skipped",
            "reason": "needs --multiview_nomv_data",
        }

    env = None
    if (args.scannet_data and args.scanrefer_dir
            and _scene_id(args) is not None):
        try:
            env = _build_predict_env(args)
        except Exception as exc:  # noqa: BLE001
            checks["predict_contract"] = {
                "status": "fail", "error": repr(exc),
                "traceback": traceback.format_exc()[-1500:],
            }
    if env is not None:
        run("predict_contract", check_predict_contract, args, env)
        run("grounding_acc", check_grounding_acc, args, env)
        run("caption_smoke", check_caption_smoke, args, env)
        run("torch_import_chain", check_torch_import_chain, args, env)
    else:
        for name in ("predict_contract", "grounding_acc", "caption_smoke",
                     "torch_import_chain"):
            checks.setdefault(name, {
                "status": "skipped",
                "reason": "needs --scannet_data and --scanrefer_dir",
            })

    ok = all(c["status"] != "fail" for c in checks.values())
    report = {"ok": ok, "checks": checks}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    summary = " ".join(
        f"{name}={c['status']}" for name, c in checks.items())
    print(f"vlp3d-validate: {'OK' if ok else 'FAIL'} ({summary}) "
          f"-> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
