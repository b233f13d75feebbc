"""Captioning fine-tune entry (scripts/joint_scripts/train_caption.py):
same JointNet + solver with the caption head enabled, warm-started from a
grounding-pretrained checkpoint via --pretrain <dir> (train_caption.py:110-115)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # captioning run: force the caption branch on (drop --no_caption)
    argv = [a for a in argv if a != "--no_caption"]
    from vlp3d.cli.train_3dvlp import main as train_main

    return train_main(argv)


if __name__ == "__main__":
    main()
