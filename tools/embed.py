"""Shim: this CLI moved into the installable package (ggml_tpu.cli.embed).
Kept so `python tools/embed.py` and `from tools.embed import ...` keep working
from a repo checkout."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.cli.embed import *  # noqa: F401,F403
from ggml_tpu.cli.embed import main  # noqa: F401

if __name__ == "__main__":
    main()
