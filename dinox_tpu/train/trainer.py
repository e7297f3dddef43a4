"""Training orchestrator: loader -> jitted step -> logging/ckpt/anomaly.

The host-side loop around the compiled step, with the reference trainer's
operational behaviors (scripts/phase5_big_run.py:1660-1997): periodic
checkpoint + rotation, NaN -> emergency checkpoint + raise, loss-spike and
collapse warnings, SIGINT-graceful final checkpoint, samples/s telemetry.
"""

from __future__ import annotations

import dataclasses
import json
import signal
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import numpy as np

from dinox_tpu.train.anomaly import AnomalyDetector
from dinox_tpu.train.checkpoint import CheckpointManager
from dinox_tpu.train.state import TrainConfig, TrainState
from dinox_tpu.utils.logging import MetricLogger


class GracefulStop:
    """SIGINT -> finish the current step, checkpoint, exit cleanly
    (reference: phase5_big_run.py:1670-1689)."""

    def __init__(self) -> None:
        self.stop = False
        self._prev = signal.signal(signal.SIGINT, self._handler)

    def _handler(self, signum, frame) -> None:  # noqa: ANN001
        print("interrupt=received, finishing step and checkpointing", flush=True)
        self.stop = True

    def restore(self) -> None:
        signal.signal(signal.SIGINT, self._prev)


def config_dict(cfg: TrainConfig) -> dict[str, Any]:
    d = dataclasses.asdict(cfg)
    return d


def train(
    cfg: TrainConfig,
    state: TrainState,
    step_fn: Callable,
    batches: Iterable,
    *,
    run_dir: str | Path,
    max_steps: int,
    start_step: int = 0,
    ckpt_every: int = 100,
    ckpt_keep_last: int = 5,
    log_jsonl: bool = False,
    tensorboard: bool = True,
    loader_position: Optional[Callable[[], tuple[int, int]]] = None,
    on_step: Optional[Callable[[int, dict, TrainState], None]] = None,
) -> TrainState:
    """Run the training loop until *max_steps* optimizer steps.

    *batches* yields objects with ``.pixels`` (accum, B, H, W, 3) uint16 and
    ``.spacing`` (accum, B, 3) float32 (or plain (B, ...) arrays which are
    lifted to accum=1).
    """
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "config.json").write_text(json.dumps(config_dict(cfg), indent=2, default=str))

    ckpt = CheckpointManager(run_dir, keep_last=ckpt_keep_last)
    logger = MetricLogger(run_dir, jsonl=log_jsonl, tensorboard=tensorboard)
    detector = AnomalyDetector()
    stop = GracefulStop()

    it = iter(batches)
    samples_per_step = cfg.effective_batch_size
    t_last, n_since = time.monotonic(), 0
    step = start_step
    last_saved = -1
    try:
        while step < max_steps and not stop.stop:
            batch = next(it)
            pixels, spacing = np.asarray(batch.pixels), np.asarray(batch.spacing)
            if pixels.ndim == 4:  # lift (B, H, W, 3) -> (1, B, H, W, 3)
                pixels, spacing = pixels[None], spacing[None]
            state, metrics = step_fn(state, pixels, spacing)
            step += 1
            n_since += samples_per_step

            host_metrics = {k: float(v) for k, v in metrics.items()}
            now = time.monotonic()
            if now - t_last >= 10.0 or step == max_steps:
                host_metrics["samples_per_s"] = n_since / (now - t_last)
                t_last, n_since = now, 0
            logger.log(step, host_metrics, force_stdout="samples_per_s" in host_metrics)

            severity, msg = detector.check(host_metrics["loss"], host_metrics.get("embed_std", 1.0))
            if severity == "fatal":
                ckpt.emergency_save(step, state, msg)
                last_saved = step  # the finally-save must not collide
                raise FloatingPointError(f"training anomaly at step {step}: {msg}")
            if severity == "warn":
                print(f"anomaly_warn step={step} {msg}", flush=True)

            if on_step is not None:
                on_step(step, host_metrics, state)

            if ckpt_every and step % ckpt_every == 0:
                ckpt.save(
                    step, state, config=config_dict(cfg),
                    loader_position=loader_position() if loader_position else None,
                )
                last_saved = step
    finally:
        # Final checkpoint — unless the periodic save already covered this step.
        if last_saved != step:
            ckpt.save(
                step, state, config=config_dict(cfg),
                loader_position=loader_position() if loader_position else None,
                force=True,
            )
        ckpt.close()
        logger.close()
        stop.restore()
    return state
