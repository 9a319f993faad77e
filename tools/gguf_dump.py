"""Shim: this CLI moved into the installable package (ggml_tpu.cli.gguf_dump).
Kept so `python tools/gguf_dump.py` and `from tools.gguf_dump import ...` keep working
from a repo checkout."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.cli.gguf_dump import *  # noqa: F401,F403
from ggml_tpu.cli.gguf_dump import main  # noqa: F401

if __name__ == "__main__":
    main()
