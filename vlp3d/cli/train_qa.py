"""ScanQA VQA training entry (scripts/joint_scripts/train_qa.py):
JointNet with use_answer=True over question annotations; answers are a
vocabulary built from the training answers (train_qa.py:32-45)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--use_answer" not in argv:
        argv.append("--use_answer")
    from vlp3d.cli.train_3dvlp import main as train_main

    return train_main(argv)


if __name__ == "__main__":
    main()
