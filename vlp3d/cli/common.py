"""Shared CLI plumbing: ScanRefer loading, dataset/solver construction."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from vlp3d.config import Config, DatasetConfig, LossConfig, ModelConfig, TrainConfig
from vlp3d.data.dataset import (
    DirectorySceneSource,
    ScanReferJointDataset,
    build_nyu40id2class,
    load_raw2label,
)
from vlp3d.data.synthetic import make_synthetic_dataset
from vlp3d.data.tokenizer import load_tokenizer


def add_common_args(p: argparse.ArgumentParser):
    # mirrors the reference's flag surface (train_3dvlp.py:588-774)
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--scanrefer_dir", type=str, default="data/scanrefer")
    p.add_argument("--scannet_data", type=str, default="data/scannet_data")
    p.add_argument("--labels_tsv", type=str, default="")
    p.add_argument("--mean_size_npz", type=str, default="")
    p.add_argument("--bert_vocab", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--wd", type=float, default=1e-3)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--num_proposals", type=int, default=256)
    p.add_argument("--lang_num_max", type=int, default=8)
    p.add_argument("--lang_num_aug", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--coslr", action="store_true")
    p.add_argument("--no_caption", action="store_true")
    p.add_argument("--no_reference", action="store_true")
    p.add_argument("--no_lang_cls", action="store_true")
    p.add_argument("--use_con", action="store_true")
    p.add_argument("--use_mlm", action="store_true")
    p.add_argument("--use_answer", action="store_true")
    p.add_argument("--use_diou_loss", action="store_true")
    p.add_argument("--use_kl_loss", action="store_true")
    p.add_argument("--use_reg_head", action="store_true")
    p.add_argument("--use_lang_emb", action="store_true")
    p.add_argument("--use_vote_weight", action="store_true")
    p.add_argument("--use_attr_loss", action="store_true")
    p.add_argument("--mask_box", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--multiview_hdf5", type=str, default="",
                   help="enet_feats_maxpool.hdf5 with per-point 128-d "
                        "features appended to the preprocess npy columns")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_height", action="store_true", default=True)
    p.add_argument("--use_distil", action="store_true")
    p.add_argument("--unfreeze", type=int, default=6)
    p.add_argument("--use_checkpoint", type=str, default="")
    p.add_argument("--pretrain", type=str, default="")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic scenes (no ScanNet needed)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes, 2 epochs — CI smoke run")
    return p


def config_from_args(args) -> Config:
    input_dim = 1  # height
    if args.use_multiview:
        input_dim += 128
    if args.use_normal:
        input_dim += 3
    # relation's object embedding slices the multiview channels when
    # present (relation_module.py:101); otherwise use whatever per-point
    # features exist
    mv_offset, mv_dim = (6, 128) if args.use_multiview else (3, input_dim)
    model = ModelConfig(
        input_feature_dim=input_dim,
        multiview_offset=mv_offset,
        multiview_dim=mv_dim,
        num_proposal=args.num_proposals,
        lang_num_max=args.lang_num_max,
        no_caption=args.no_caption,
        no_reference=args.no_reference,
        use_lang_classifier=not args.no_lang_cls,
        use_con=args.use_con,
        use_mlm=args.use_mlm,
        use_answer=args.use_answer,
        use_reg_head=args.use_reg_head,
        use_kl_loss=args.use_kl_loss,
        use_lang_emb=args.use_lang_emb,
        use_vote_weight=args.use_vote_weight,
        mask_box=args.mask_box,
        use_distil=args.use_distil,
    )
    return Config(
        dataset=DatasetConfig(
            num_points=args.num_points, mean_size_path=args.mean_size_npz
        ),
        model=model,
        loss=LossConfig(
            use_diou_loss=args.use_diou_loss,
            use_attr_loss=args.use_attr_loss,
            debug=args.debug,
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            epochs=args.epoch,
            lr=args.lr,
            weight_decay=args.wd,
            seed=args.seed,
        ),
    )


def resolve_config(args) -> Config:
    """config_from_args, or the tiny synthetic config when --smoke."""
    import dataclasses

    from vlp3d.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    if getattr(args, "smoke", False):
        from vlp3d.data.synthetic import tiny_config

        tiny = tiny_config(
            no_caption=args.no_caption,
            use_con=args.use_con,
            use_mlm=args.use_mlm,
            use_answer=args.use_answer,
        )
        args.synthetic = True
        return dataclasses.replace(
            tiny,
            train=dataclasses.replace(
                tiny.train, batch_size=min(args.batch_size, 2), epochs=2
            ),
        )
    return config_from_args(args)


def load_scanrefer(scanrefer_dir: str, split: str) -> list:
    path = os.path.join(scanrefer_dir, f"ScanRefer_filtered_{split}.json")
    with open(path) as f:
        data = json.load(f)
    return sorted(data, key=lambda d: (d["scene_id"], int(d["object_id"])))


def build_datasets(args, config: Config):
    if args.synthetic:
        train = make_synthetic_dataset(
            config, n_scenes=4, anns_per_scene=10, augment=True,
            shuffle=True, seed=args.seed,
        )
        val = make_synthetic_dataset(
            config, n_scenes=2, anns_per_scene=6, split="val",
            seed=args.seed + 1,
        )
        return train, val

    raw2label = load_raw2label(args.labels_tsv) if args.labels_tsv else {}
    nyu40map = (
        build_nyu40id2class(args.labels_tsv) if args.labels_tsv else {}
    )
    tokenizer = load_tokenizer(args.bert_vocab or None)
    source = DirectorySceneSource(
        args.scannet_data, multiview_hdf5=args.multiview_hdf5 or None
    )
    mean_size = config.dataset.mean_size_arr()

    def make(split, augment, shuffle):
        return ScanReferJointDataset(
            load_scanrefer(args.scanrefer_dir, split),
            source,
            tokenizer,
            split=split,
            num_points=config.dataset.num_points,
            lang_num_max=config.model.lang_num_max,
            lang_num_aug=args.lang_num_aug,
            augment=augment,
            shuffle=shuffle,
            mean_size_arr=mean_size,
            raw2label=raw2label,
            nyu40id2class=nyu40map,
            bert_max_len=config.model.bert_seq_len,
            seed=args.seed,
        )

    return make("train", True, True), make("val", False, False)
