"""Multi-host data parallelism: two real processes over jax.distributed on
localhost, each feeding its host-local shard of the global batch via
put_global_batch — loss must match the single-process result (SURVEY.md §5
"Distributed communication backend"; the reference has no analog)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[2], int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from dinox_tpu.models.config import ModelConfig
from dinox_tpu.parallel.mesh import make_mesh, put_global_batch, state_shardings
from dinox_tpu.train.state import TrainConfig, create_train_state
from dinox_tpu.train.step import build_train_step

tiny = ModelConfig(name="mh-tiny", img_size=32, patch=16, dim=32, depth=2, heads=2,
                   out_dim=64, num_registers=2, attn_impl="xla", dtype="float32")
cfg = TrainConfig(model=tiny, img_size=32, batch_size=8, lr=1e-3,
                  warmup_steps=2, max_steps=50, koleo_weight=0.1, train_seed=0)

mesh = make_mesh()  # global mesh over both processes' devices
state = create_train_state(cfg, jax.random.key(0))
state = jax.device_put(state, state_shardings(mesh, state))
step_fn = build_train_step(cfg, mesh=mesh, donate=False)

rng = np.random.default_rng(0)  # same seed both processes -> same global batch
pixels = rng.integers(30000, 36000, (1, 8, 48, 48, 3)).astype(np.uint16)
spacing = rng.uniform(0.5, 2.0, (1, 8, 3)).astype(np.float32)
lo, hi = pid * 4, (pid + 1) * 4  # host-local shard of the global batch
px, sp = put_global_batch(mesh, (pixels[:, lo:hi], spacing[:, lo:hi]))
state, metrics = step_fn(state, px, sp)
loss = float(jax.device_get(metrics["loss"]))
if pid == 0:
    print("RESULT " + json.dumps({"loss": loss}), flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel_matches_single():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(REPO), coord, str(pid)],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
    result = [ln for ln in outs[0][1].splitlines() if ln.startswith("RESULT ")]
    assert result, outs[0][1]
    loss_mh = json.loads(result[0][len("RESULT "):])["loss"]

    # single-process reference on this process's own 8 virtual devices
    import jax

    from dinox_tpu.models.config import ModelConfig
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step

    tiny = ModelConfig(name="mh-tiny", img_size=32, patch=16, dim=32, depth=2, heads=2,
                       out_dim=64, num_registers=2, attn_impl="xla", dtype="float32")
    cfg = TrainConfig(model=tiny, img_size=32, batch_size=8, lr=1e-3,
                      warmup_steps=2, max_steps=50, koleo_weight=0.1, train_seed=0)
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    pixels = rng.integers(30000, 36000, (1, 8, 48, 48, 3)).astype(np.uint16)
    spacing = rng.uniform(0.5, 2.0, (1, 8, 3)).astype(np.float32)
    _, metrics = step_fn(state, pixels, spacing)
    assert loss_mh == pytest.approx(float(metrics["loss"]), rel=1e-4)
