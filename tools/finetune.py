"""Shim: this CLI moved into the installable package (ggml_tpu.cli.finetune).
Kept so `python tools/finetune.py` and `from tools.finetune import ...` keep working
from a repo checkout."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.cli.finetune import *  # noqa: F401,F403
from ggml_tpu.cli.finetune import main  # noqa: F401

if __name__ == "__main__":
    main()
