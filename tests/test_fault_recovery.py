"""Fault injection + restartable training — the elastic-recovery drill the
reference lacks entirely (SURVEY.md §5: its RPC treats socket errors as hard
failures; no restart path).

Drills:
1. a training PROCESS is SIGKILLed mid-run; a fresh process resumes from the
   newest checkpoint and finishes BIT-IDENTICAL to an uninterrupted run;
2. the newest checkpoint file is corrupted on disk; recovery falls back to
   the previous intact one (latest_checkpoint validation);
3. a kill landing mid-checkpoint-write cannot corrupt anything: the atomic
   tmp+rename publish leaves either the old file or the new one.
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent

# deterministic toy training: linear regression via the real Optimizer stack.
# argv: ckpt_dir total_steps ckpt_every [kill_after_step]
# Resumes from the newest valid checkpoint if one exists; writes
# step<N>.gguf after every ckpt_every steps; prints final weights on finish.
_TRAIN = r"""
import sys
import numpy as np
import jax.numpy as jnp
from ggml_tpu.checkpoint import latest_checkpoint, load_optimizer, save_optimizer
from ggml_tpu.opt import AdamWConfig, Optimizer

ckpt_dir, total, every = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
kill_after = int(sys.argv[4]) if len(sys.argv) > 4 else -1

rng = np.random.default_rng(77)
params = {"w": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
          "b": jnp.zeros((3,), jnp.float32)}
x = rng.standard_normal((16, 4)).astype(np.float32)
y = (x @ rng.standard_normal((4, 3)).astype(np.float32)).astype(np.float32)

opt = Optimizer(lambda p, x: x @ p["w"] + p["b"], params, loss_type="mse",
                adamw=AdamWConfig(alpha=0.01))
path, step = latest_checkpoint(ckpt_dir)
if path is not None:
    load_optimizer(path, opt)
    print(f"resumed from step {step}", flush=True)
else:
    step = 0

for s in range(step + 1, total + 1):
    opt.step(x, y)
    if s % every == 0:
        save_optimizer(f"{ckpt_dir}/step{s}.gguf", opt)
    if s == kill_after:
        print("KILLING-SELF", flush=True)
        import os, signal
        os.kill(os.getpid(), signal.SIGKILL)  # injected fault: no cleanup runs

w = np.asarray(opt.state["params"]["w"])
print("FINAL", ",".join(f"{v:.9e}" for v in w.reshape(-1)), flush=True)
"""


def _run(args, expect_kill=False):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", _TRAIN, *map(str, args)],
                       capture_output=True, text=True, env=env, cwd=ROOT, timeout=300)
    if expect_kill:
        assert r.returncode == -signal.SIGKILL, (r.returncode, r.stderr[-1000:])
    else:
        assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _final(stdout):
    line = [l for l in stdout.splitlines() if l.startswith("FINAL ")][0]
    return np.asarray([float(v) for v in line[6:].split(",")])


def test_sigkill_resume_is_bit_identical(tmp_path):
    # control: uninterrupted 12 steps, checkpoints every 3
    ctrl = tmp_path / "ctrl"
    ctrl.mkdir()
    want = _final(_run([ctrl, 12, 3]))

    # fault run: SIGKILL at step 8 (after the step-6 checkpoint)
    d = tmp_path / "crash"
    d.mkdir()
    out = _run([d, 12, 3, 8], expect_kill=True)
    assert "KILLING-SELF" in out
    assert (d / "step6.gguf").exists()

    # fresh process resumes from step 6 and finishes
    out2 = _run([d, 12, 3])
    assert "resumed from step 6" in out2
    got = _final(out2)
    np.testing.assert_array_equal(got, want)


def test_corrupt_checkpoint_falls_back(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    _run([d, 6, 3])  # writes step3, step6
    # storage corruption on the newest checkpoint
    p6 = d / "step6.gguf"
    p6.write_bytes(p6.read_bytes()[: 40])

    from ggml_tpu.checkpoint import latest_checkpoint

    path, step = latest_checkpoint(d)
    assert step == 3 and path.name == "step3.gguf"

    out = _run([d, 9, 3])  # resumes from 3, retrains 4..9
    assert "resumed from step 3" in out


def test_atomic_publish_never_leaves_partial_file(tmp_path):
    """The checkpoint appears atomically: while writing, only '<name>.tmp'
    exists; os.replace publishes it whole.  Simulate a crash between write
    and rename: the stale .tmp is ignored by latest_checkpoint."""
    import jax.numpy as jnp

    from ggml_tpu.checkpoint import latest_checkpoint, save_params

    d = tmp_path
    save_params(d / "step2.gguf", {"a": jnp.ones((2,), jnp.float32)})
    # a crash mid-write leaves only the tmp of the NEXT checkpoint
    (d / "step4.gguf.tmp").write_bytes(b"GGUF garbage...")
    path, step = latest_checkpoint(d)
    assert step == 2 and path.name == "step2.gguf"
