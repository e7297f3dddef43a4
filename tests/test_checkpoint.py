"""Checkpoint/resume tests: save-restore fidelity, rotation, auto-resume,
emergency save, and resume-continues-identically (the canary's resume-fidelity
property, scripts/integration_canary.py:189-272, as a unit test)."""

import jax
import numpy as np
import pytest

from dinox_tpu.train.checkpoint import CheckpointManager, find_latest_run
from dinox_tpu.train.state import create_train_state
from dinox_tpu.train.step import build_train_step
from tests.test_train_step import TINY, fake_batch


def trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path):
    state = create_train_state(TINY, jax.random.key(0))
    mgr = CheckpointManager(tmp_path / "run", keep_last=3, async_save=False)
    mgr.save(0, state, config={"lr": 1e-4}, loader_position=(2, 7))
    mgr.wait()
    template = create_train_state(TINY, jax.random.key(1))  # different values
    restored, meta = mgr.restore(template)
    trees_equal(restored, state)
    assert meta["loader_epoch"] == 2 and meta["loader_batch"] == 7
    assert meta["config"]["lr"] == 1e-4
    mgr.close()


def test_rotation_keeps_last_n(tmp_path):
    state = create_train_state(TINY, jax.random.key(0))
    mgr = CheckpointManager(tmp_path / "run", keep_last=2, async_save=False)
    for s in (1, 2, 3, 4):
        mgr.save(s, state)
    mgr.wait()
    assert mgr.latest_step() == 4
    steps = sorted(int(p.name) for p in (tmp_path / "run" / "ckpt").iterdir() if p.name.isdigit())
    assert steps == [3, 4]
    mgr.close()


def test_restore_empty_raises(tmp_path):
    mgr = CheckpointManager(tmp_path / "run", async_save=False)
    with pytest.raises(FileNotFoundError):
        mgr.restore(create_train_state(TINY, jax.random.key(0)))
    mgr.close()


def test_find_latest_run(tmp_path):
    assert find_latest_run(tmp_path) is None
    state = create_train_state(TINY, jax.random.key(0))
    for name in ("run_a", "run_b"):
        m = CheckpointManager(tmp_path / name, async_save=False)
        m.save(1, state)
        m.close()
    (tmp_path / "run_b" / "touch").write_text("x")
    assert find_latest_run(tmp_path).name == "run_b"


def test_emergency_save_writes_marker(tmp_path):
    state = create_train_state(TINY, jax.random.key(0))
    mgr = CheckpointManager(tmp_path / "run", async_save=False)
    mgr.emergency_save(5, state, "non-finite loss: nan")
    marker = tmp_path / "run" / "EMERGENCY.txt"
    assert marker.exists() and "nan" in marker.read_text()
    assert mgr.latest_step() == 5
    mgr.close()


def test_resume_training_continues_identically(tmp_path):
    """4 straight steps == 2 steps + save/restore + 2 steps, bit-exact.

    Works because all step randomness is a pure function of (seed, step):
    no RNG blobs needed in the checkpoint."""
    step_fn = build_train_step(TINY, donate=False)

    def data(i):
        return fake_batch(TINY, seed=i)

    straight = create_train_state(TINY, jax.random.key(0))
    for i in range(4):
        straight, _ = step_fn(straight, *data(i))

    state = create_train_state(TINY, jax.random.key(0))
    for i in range(2):
        state, _ = step_fn(state, *data(i))
    mgr = CheckpointManager(tmp_path / "run", async_save=False)
    mgr.save(2, state)
    mgr.wait()
    resumed, _ = mgr.restore(create_train_state(TINY, jax.random.key(9)))
    for i in range(2, 4):
        resumed, _ = step_fn(resumed, *data(i))
    trees_equal(resumed.student, straight.student)
    trees_equal(resumed.teacher, straight.teacher)
    np.testing.assert_array_equal(np.asarray(resumed.center), np.asarray(straight.center))
    mgr.close()


def test_save_watchdog_abandons_wedged_save(tmp_path, monkeypatch):
    """A save whose blocking portion never returns (dead transfer channel)
    is abandoned after save_timeout_s: save() returns False, the manager is
    marked wedged, later checkpoint ops are skipped fast, and close() does
    not block."""
    import threading
    import time as _time

    state = create_train_state(TINY, jax.random.key(0))
    mgr = CheckpointManager(tmp_path / "run", async_save=False, save_timeout_s=0.5)
    hang = threading.Event()
    monkeypatch.setattr(mgr._mgr, "save", lambda *a, **k: hang.wait())
    monkeypatch.setattr(mgr._mgr, "wait_until_finished", lambda: hang.wait())

    t0 = _time.monotonic()
    assert mgr.save(1, state) is False
    assert mgr.wedged
    assert _time.monotonic() - t0 < 5.0
    # wedged manager: everything becomes a fast no-op
    t0 = _time.monotonic()
    assert mgr.save(2, state) is False
    mgr.wait()
    mgr.close()
    assert _time.monotonic() - t0 < 1.0
    hang.set()  # release the daemon thread


def test_save_watchdog_passthrough_when_healthy(tmp_path):
    """With the watchdog armed, a normal save completes, returns True, and
    the checkpoint restores bit-for-bit."""
    state = create_train_state(TINY, jax.random.key(0))
    mgr = CheckpointManager(tmp_path / "run", async_save=False, save_timeout_s=60.0)
    assert mgr.save(1, state) is True
    assert not mgr.wedged
    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored, meta = mgr.restore(template)
    trees_equal(restored, state)
    mgr.close()


def test_trainer_raises_on_wedged_final_save(tmp_path, monkeypatch):
    """The training loop completes its steps, then surfaces the wedged final
    save as CheckpointWedgedError (metrics/curves intact) instead of
    hanging."""
    import threading

    import dinox_tpu.train.trainer as trainer_mod
    from dinox_tpu.train.trainer import CheckpointWedgedError, train

    hang = threading.Event()

    class WedgingMgr(CheckpointManager):
        def __init__(self, run_dir, keep_last=5, async_save=True, save_timeout_s=None):
            super().__init__(run_dir, keep_last=keep_last, async_save=async_save,
                             save_timeout_s=save_timeout_s)
            self._mgr_save = self._mgr.save
            self._mgr.save = lambda *a, **k: hang.wait()

    monkeypatch.setattr(trainer_mod, "CheckpointManager", WedgingMgr)
    state = create_train_state(TINY, jax.random.key(0))
    from dinox_tpu.train.step import build_train_step

    step_fn = build_train_step(TINY, donate=False)
    batches = (fake_batch(TINY, seed=i) for i in range(2))

    class B:
        def __init__(self, px, sp):
            self.pixels, self.spacing = px, sp

    with pytest.raises(CheckpointWedgedError):
        train(
            TINY, state, step_fn, (B(*b) for b in batches),
            run_dir=tmp_path / "run", max_steps=2, ckpt_every=0,
            ckpt_timeout_s=0.5, tensorboard=False,
        )
    hang.set()


def test_load_backbone_from_run_restores_on_host(tmp_path):
    """load_backbone_from_run stages ONLY the backbone to the default device;
    the full state restores from an abstract template into host memory (a
    concrete ViT-G TrainState — student+teacher+moments, ~14 GB — OOMed the
    single chip next to eval activations, docs/round4 retrieval log)."""
    import json

    from dinox_tpu.train.run_export import load_backbone_from_run, load_state_from_run
    from dinox_tpu.train.trainer import config_dict

    state = create_train_state(TINY, jax.random.key(0))
    run = tmp_path / "run"
    mgr = CheckpointManager(run, async_save=False)
    mgr.save(3, state)
    mgr.close()
    (run / "config.json").write_text(json.dumps(config_dict(TINY), default=str))

    hstate, _, meta = load_state_from_run(run, host=True)
    assert meta["step"] == 3
    for leaf in jax.tree_util.tree_leaves(hstate):
        assert isinstance(leaf, np.ndarray)  # host memory, no device at all
    trees_equal(hstate, state)

    model = load_backbone_from_run(run)
    trees_equal(model.params, state.student["backbone"])
