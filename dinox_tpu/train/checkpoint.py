"""Orbax checkpointing with rotation, auto-resume and emergency saves.

TPU-native replacement for the reference's single-file torch payload +
rotation + `--resume auto` machinery (scripts/phase5_big_run.py:1104-1207,
1471-1504): the whole TrainState pytree (step, student, teacher, AdamW state,
DINO center) is saved atomically and asynchronously by Orbax; training config
and the data-loader position ride along as JSON metadata (loader position is
a capability the reference lacks, scripts/integration_canary.py:192-197).
RNG needs no checkpointing at all — augmentation keys are pure functions of
(seed, step) (see dinox_tpu.ops.augment), which is the JAX answer to the
reference's pickled python/numpy/torch/cuda RNG blobs (:1032-1078).
"""

from __future__ import annotations

import logging
import threading
from pathlib import Path
from typing import Any, Callable, Optional

import orbax.checkpoint as ocp

from dinox_tpu.train.state import TrainState

log = logging.getLogger(__name__)


class CheckpointWedgedError(RuntimeError):
    """A checkpoint save exceeded its watchdog timeout and was abandoned."""


class CheckpointManager:
    """Thin wrapper around ocp.CheckpointManager for a single run directory.

    *save_timeout_s* (0/None = disabled) arms a watchdog around every
    blocking checkpoint operation: the D2H drain of a multi-GB TrainState can
    wedge indefinitely on a dead transfer channel (observed on the dev
    tunnel: ViT-L/G end-of-run saves stall with zero I/O after the metadata
    write). On timeout the operation is abandoned on a daemon thread,
    ``self.wedged`` is set, and every later checkpoint call becomes a
    logged no-op — the run's metrics/curves survive even when its final
    state cannot be drained."""

    def __init__(self, run_dir: str | Path, keep_last: int = 5, async_save: bool = True,
                 save_timeout_s: Optional[float] = None):
        self.run_dir = Path(run_dir).absolute()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.save_timeout_s = save_timeout_s or 0.0
        self.wedged = False
        self._mgr = ocp.CheckpointManager(
            self.run_dir / "ckpt",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_last,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def _guarded(self, fn: Callable[[], None], what: str) -> bool:
        """Run *fn*; with a watchdog armed, abandon it after save_timeout_s.
        Returns False when skipped (already wedged) or timed out."""
        if self.wedged:
            log.error("checkpoint channel wedged earlier; skipping %s", what)
            return False
        if not self.save_timeout_s:
            fn()
            return True
        errs: list[BaseException] = []

        def target() -> None:
            try:
                fn()
            except BaseException as e:  # surfaced on the caller thread below
                errs.append(e)

        t = threading.Thread(target=target, daemon=True, name=f"ckpt-{what}")
        t.start()
        t.join(self.save_timeout_s)
        if t.is_alive():
            self.wedged = True
            log.error(
                "%s exceeded the %.0f s checkpoint watchdog — the device->"
                "host drain is wedged (known failure mode for multi-GB "
                "states over a dead transfer channel). Continuing WITHOUT "
                "this checkpoint; later checkpoint ops will be skipped.",
                what, self.save_timeout_s,
            )
            return False
        if errs:
            raise errs[0]
        return True

    def save(
        self,
        step: int,
        state: TrainState,
        *,
        config: Optional[dict[str, Any]] = None,
        loader_position: Optional[tuple[int, int]] = None,
        force: bool = False,
    ) -> bool:
        meta = {
            "step": int(step),
            "config": config or {},
            "loader_epoch": loader_position[0] if loader_position else 0,
            "loader_batch": loader_position[1] if loader_position else 0,
        }
        return self._guarded(
            lambda: self._mgr.save(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(state),
                    meta=ocp.args.JsonSave(meta),
                ),
                force=force,
            ),
            f"save(step={step})",
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state_template: TrainState, step: Optional[int] = None
    ) -> tuple[TrainState, dict[str, Any]]:
        """Restore state (shaped/sharded like *state_template*) + metadata."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.run_dir}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"]

    def wait(self) -> None:
        self._guarded(self._mgr.wait_until_finished, "wait_until_finished")

    def close(self) -> None:
        if self._guarded(self._mgr.wait_until_finished, "wait_until_finished"):
            self._mgr.close()

    def emergency_save(self, step: int, state: TrainState, reason: str) -> None:
        """Synchronous save on anomaly (NaN/Inf), mirroring the reference's
        emergency checkpoint before crashing (phase5_big_run.py:1210-1230)."""
        log.error("EMERGENCY checkpoint at step %d: %s", step, reason)
        (self.run_dir / "EMERGENCY.txt").write_text(f"step={step}\nreason={reason}\n")
        self.save(step, state, force=True)
        self.wait()


def find_latest_run(base_dir: str | Path) -> Optional[Path]:
    """Most recently modified run directory containing checkpoints —
    the `--resume auto` behavior (phase5_big_run.py:1471-1495)."""
    base = Path(base_dir)
    if not base.is_dir():
        return None
    candidates = [d for d in base.iterdir() if d.is_dir() and (d / "ckpt").is_dir()]
    if not candidates:
        return None
    return max(candidates, key=lambda d: d.stat().st_mtime)
