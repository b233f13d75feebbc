"""vlp3d-export-torch: convert a vlp3d (orbax) checkpoint into a
reference PyTorch state dict — the inverse of vlp3d-import-torch,
closing the migration loop: train on TPU with vlp3d, hand the weights
back to the reference stack (its eval harnesses, visualizers, further
torch finetuning).

    vlp3d-export-torch --model_dir ckpt/ --out model.pth
    # then, on the reference side:
    #   model.load_state_dict(torch.load("model.pth"), strict=False)

The reference model serializes weights our tree deliberately doesn't
carry (BERT layers >= fusion_layer + the MaskedLM head — text mode runs
layers [0, fusion) only, xbert.py:550-552 — and several dead submodules
its forwards never touch). Pass --base <original.pth> to carry those
through from the checkpoint you originally imported; the result then
loads with strict=True. Without --base, load with strict=False (torch
keeps its init for the missing dead weights).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="vlp3d checkpoint dir (save_params root)")
    p.add_argument("--name", default="model",
                   help="snapshot name inside --model_dir")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--base", default=None,
                   help="reference .pth to merge: keys the export "
                        "doesn't produce (dead BERT tail etc.) carry "
                        "through unchanged, enabling strict=True loads")
    p.add_argument("--dp_prefix", action="store_true",
                   help="prepend 'module.' to every key (the layout "
                        "nn.DataParallel checkpoints carry)")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from vlp3d.models.torch_export import export_jointnet_state_dict
    from vlp3d.train.checkpoint import load_params

    saved = load_params(args.model_dir, args.name)
    out = export_jointnet_state_dict(
        saved["params"], saved.get("batch_stats", {}),
        dp_prefix=args.dp_prefix)
    # np.array copy: exported leaves can be read-only jax views, which
    # torch.from_numpy rejects as non-writable
    sd = {k: torch.from_numpy(np.array(v)) for k, v in out.items()}

    carried = 0
    if args.base:
        base = torch.load(args.base, map_location="cpu",
                          weights_only=False)
        if isinstance(base, dict) and "model_state_dict" in base:
            base = base["model_state_dict"]  # checkpoint.tar flavor
        for k, v in base.items():
            key = "module." + k if (
                args.dp_prefix and not k.startswith("module.")) else k
            if key not in sd:
                sd[key] = v
                carried += 1

    torch.save(sd, args.out)
    extra = f" + {carried} carried from --base" if args.base else ""
    print(f"vlp3d-export-torch: {len(out)} exported keys{extra} "
          f"-> {args.out}"
          + ("" if args.base else " (load with strict=False)"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
