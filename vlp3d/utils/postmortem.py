"""Post-mortem debugger hook (the reference's root-level crash_on_ipy.py):
importing this module — or calling install() — drops into a pdb/IPython
post-mortem shell on any uncaught exception.

Usage: `import vlp3d.utils.postmortem` at the top of a script, or
`python -c "import vlp3d.utils.postmortem, runpy; runpy.run_module(...)"`.
"""

from __future__ import annotations

import sys


def install() -> None:
    def hook(exc_type, exc, tb):
        sys.__excepthook__(exc_type, exc, tb)
        if not sys.stderr.isatty():
            return
        try:
            from IPython.core import ultratb

            ultratb.FormattedTB(mode="Plain", call_pdb=1)(exc_type, exc, tb)
        except ImportError:
            import pdb

            pdb.post_mortem(tb)

    sys.excepthook = hook


install()
