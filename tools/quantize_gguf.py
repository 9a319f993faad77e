"""Shim: this CLI moved into the installable package (ggml_tpu.cli.quantize_gguf).
Kept so `python tools/quantize_gguf.py` and `from tools.quantize_gguf import ...` keep working
from a repo checkout."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.cli.quantize_gguf import *  # noqa: F401,F403
from ggml_tpu.cli.quantize_gguf import main  # noqa: F401

if __name__ == "__main__":
    main()
