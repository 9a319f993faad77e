"""Training / optimization subsystem — the ggml-opt analog.

Reference: include/ggml-opt.h + src/ggml-opt.cpp (854 LoC): dataset with
shard-wise shuffle, opt context with loss construction, fused AdamW update,
epoch/fit loops with loss±stderr / accuracy±binomial-stderr reporting.

TPU-native redesign: jax.grad replaces ggml_build_backward_expand, the AdamW
step is one donated jitted update (the OPT_STEP_ADAMW fused-op analog), and
gradient accumulation (opt_period) is a lax.cond inside the step.
"""

from .dataset import Dataset  # noqa: F401
from .optimizer import AdamWConfig, Optimizer, LOSS_TYPES  # noqa: F401
from .fit import Result, epoch, fit  # noqa: F401
from .finetune import finetune, save_params_gguf, token_windows  # noqa: F401
from .lora import (  # noqa: F401
    apply_lora_to_params, finetune_lora, init_lora, load_lora_gguf,
    merge_lora, save_lora_gguf,
)
