"""vlp3d-import-torch: convert a reference PyTorch checkpoint into a
vlp3d (orbax) checkpoint.

Accepts any of the reference's snapshot flavors (model.pth /
model_last.pth / ground_model*.pth / caption_model.pth saved by
lib/joint/solver_3dvlp.py, or checkpoint.tar whose
"model_state_dict" is extracted — train_3dvlp.py:160-171), converts it
through vlp3d.models.torch_import, and writes a checkpoint that
`--model_dir` / `--pretrain` consumers load directly. A user of the
reference switches to vlp3d with their trained weights in one command:

    vlp3d-import-torch --checkpoint runs/XYZ/model_last.pth --out ckpt/
    vlp3d-predict --model_dir ckpt/ ...
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help=".pth state dict or checkpoint.tar")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--name", default="model",
                   help="snapshot name (load_params(out, name))")
    p.add_argument("--fusion_layer", type=int, default=6,
                   help="BERT text-mode depth (config_bert.json's "
                        "fusion_layer; ALBEF default 6)")
    args = p.parse_args(argv)

    import torch

    from vlp3d.models.torch_import import import_jointnet_state_dict
    from vlp3d.train.checkpoint import save_params

    sd = torch.load(args.checkpoint, map_location="cpu",
                    weights_only=False)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]  # checkpoint.tar flavor
    params, stats = import_jointnet_state_dict(
        sd, fusion_layer=args.fusion_layer)

    os.makedirs(args.out, exist_ok=True)
    save_params(args.out, args.name, params, stats)
    # orbax commits asynchronously; join before reporting success so a
    # failed background commit can't leave the user with exit 0 and a
    # missing checkpoint
    from vlp3d.train.checkpoint import wait_until_finished

    wait_until_finished()

    import jax

    n_leaves = len(jax.tree_util.tree_leaves(params))
    submodules = sorted(params.keys())
    print(
        f"vlp3d-import-torch: {n_leaves} param leaves "
        f"({', '.join(submodules)}) -> {args.out}/{args.name}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
