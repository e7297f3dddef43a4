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
from dinox_tpu.train.checkpoint import CheckpointManager, CheckpointWedgedError
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
    ckpt_timeout_s: float = 0.0,
    log_jsonl: bool = False,
    flush_max_steps: int = 64,
    flush_secs: float = 10.0,
    anomaly_spike_floor: float = 0.0,
    tensorboard: bool = True,
    loader_position: Optional[Callable[[], tuple[int, int]]] = None,
    on_step: Optional[Callable[[int, dict, TrainState], None]] = None,
    profile_steps: int = 0,
    profile_start: int = 2,
    mesh=None,
) -> TrainState:
    """Run the training loop until *max_steps* optimizer steps.

    *batches* yields objects with ``.pixels`` (accum, B, H, W, 3) uint16 and
    ``.spacing`` (accum, B, 3) float32 (or plain (B, ...) arrays which are
    lifted to accum=1). When *mesh* is given, host-local batches are placed
    as global batch-sharded arrays (multi-host: each process contributes its
    shard — see parallel.mesh.put_global_batch).
    """
    import jax

    # Only process 0 writes the metric sinks and config (multi-host runs
    # share one logical run); every process participates in the distributed
    # checkpoint saves below.
    main_proc = jax.process_index() == 0
    single_proc = jax.process_count() == 1
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    if main_proc:
        (run_dir / "config.json").write_text(
            json.dumps(config_dict(cfg), indent=2, default=str))

    ckpt = CheckpointManager(run_dir, keep_last=ckpt_keep_last,
                             save_timeout_s=ckpt_timeout_s)
    logger = MetricLogger(run_dir, jsonl=log_jsonl and main_proc,
                          tensorboard=tensorboard and main_proc,
                          stdout=main_proc)
    detector = AnomalyDetector(spike_floor=anomaly_spike_floor)
    stop = GracefulStop()

    it = iter(batches)
    samples_per_step = cfg.effective_batch_size
    t_last, n_since = time.monotonic(), 0
    data_wait_since = 0.0  # host time blocked in next(it) since last flush
    step = start_step
    last_saved = -1
    # Device metrics are buffered and converted to host floats on a 10-s
    # cadence (or at checkpoint/final steps): a per-step float() would block
    # on the device every step and defeat async dispatch — the XLA analog of
    # the reference's "don't .item() in the hot loop" rule.
    pending: list[tuple[int, dict]] = []

    def flush() -> None:
        nonlocal t_last, n_since, last_saved, data_wait_since
        if not pending:
            return
        try:
            # ONE device->host transfer for the whole buffer: per-scalar
            # float(v) costs a full RPC round trip each on remote/tunneled
            # devices (~10 scalars x RTT per step made the drain, and the
            # samples/s telemetry derived from it, latency-bound).
            import jax.numpy as jnp

            keys = sorted(pending[0][1])
            # The batched transfer indexes every buffered dict with one key
            # set; a schema drift mid-window would otherwise surface as a
            # bare KeyError while the finally-clause discards the buffer.
            for s, m in pending:
                if sorted(m) != keys:
                    raise RuntimeError(
                        f"metric key set changed mid-buffer at step {s}: "
                        f"{sorted(m)} vs {keys}"
                    )
            stacked = np.asarray(
                jnp.stack([
                    jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])
                    for _, m in pending
                ])
            )
            host_rows = [dict(zip(keys, row.tolist())) for row in stacked]
            for i, ((s, _m), host) in enumerate(zip(pending, host_rows)):
                is_last = i == len(pending) - 1
                if is_last:
                    now = time.monotonic()  # after the device sync above
                    host["samples_per_s"] = n_since / max(now - t_last, 1e-9)
                    # fraction of wall time the loop spent blocked on the
                    # host loader (the tuner's data-wait split, in-loop)
                    host["data_wait_frac"] = data_wait_since / max(now - t_last, 1e-9)
                    t_last, n_since = now, 0
                    data_wait_since = 0.0
                logger.log(s, host, force_stdout=is_last)
                severity, msg = detector.check(host["loss"], host.get("embed_std", 1.0))
                if severity == "fatal":
                    # The live state is at `step`, not at the buffered anomaly
                    # step s — save it under its own step so a later resume is
                    # self-consistent (no silent step replay); the message
                    # records where the anomaly was detected.
                    ckpt.emergency_save(
                        step, state, f"{msg} (detected at step {s})"
                    )
                    last_saved = step  # the finally-save must not collide
                    raise FloatingPointError(f"training anomaly at step {s}: {msg}")
                if severity == "warn":
                    print(f"anomaly_warn step={s} {msg}", flush=True)
        finally:
            # Clear even on raise: the finally-block's drain must not replay
            # the same buffer (duplicate logs + a second emergency save).
            pending.clear()

    # jax.profiler trace window: [start_step+profile_start, +profile_steps),
    # skipping the compile step — the TPU analog of the reference tuner's
    # per-phase perf_counter segmentation (reference tune_throughput.py:630-700).
    profile_at = step + profile_start if profile_steps > 0 else -1
    profiling = False

    try:
        while step < max_steps and not stop.stop:
            t_fetch = time.monotonic()
            batch = next(it)
            data_wait_since += time.monotonic() - t_fetch
            pixels, spacing = batch.pixels, batch.spacing
            if hasattr(pixels, "addressable_shards"):
                # already device-resident (e.g. pre-staged synthetic batches):
                # pulling it to host and back would cost a full H2D round trip
                pass
            else:
                pixels, spacing = np.asarray(pixels), np.asarray(spacing)
                if pixels.ndim == 4:  # lift (B, H, W, 3) -> (1, B, H, W, 3)
                    pixels, spacing = pixels[None], spacing[None]
                if mesh is not None:
                    from dinox_tpu.parallel.mesh import put_global_batch

                    pixels, spacing = put_global_batch(mesh, (pixels, spacing))

            if not single_proc and step == start_step and hasattr(step_fn, "lower"):
                # Multi-process first-dispatch alignment: Gloo's per-executable
                # context rendezvous has a hard ~30 s deadline, and the first
                # train-step dispatch carries a minutes-long compile whose
                # duration can differ across processes (cache state, host
                # load). AOT-compile first — populating the persistent
                # compilation cache without executing — then re-align on the
                # coordination service; the real dispatch's compile is then a
                # disk-cache hit on every process and they rendezvous within
                # seconds of each other.
                from dinox_tpu.parallel.mesh import host_barrier

                try:
                    step_fn.lower(state, pixels, spacing).compile()
                    host_barrier("dinox_tpu:step_compiled", timeout_s=3600)
                except Exception as e:  # alignment is best-effort
                    print(f"pre-compile alignment skipped: {e!r}", flush=True)
            if step == profile_at and not profiling:
                import jax

                jax.block_until_ready(state.step)  # trace only steady-state work
                jax.profiler.start_trace(str(run_dir / "profile"))
                profiling = True
            state, metrics = step_fn(state, pixels, spacing)
            step += 1
            n_since += samples_per_step
            pending.append((step, metrics))

            if profiling and step >= profile_at + profile_steps:
                import jax

                jax.block_until_ready(state.step)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {run_dir / 'profile'}", flush=True)

            if on_step is not None:
                # metrics stay on-device here; hooks that need host values
                # convert on their own cadence.
                on_step(step, metrics, state)

            due_ckpt = bool(ckpt_every and step % ckpt_every == 0)
            # Flush on the wall-clock cadence OR when the buffer hits
            # flush_max_steps: dispatch is asynchronous and much faster than
            # execution with device-resident batches, so a wall-clock-only
            # trigger lets the loop enqueue thousands of steps and then stall
            # in one giant drain (sawtooth telemetry, minutes-late anomaly
            # detection). flush_max_steps bounds how many steps a divergence
            # can burn before the NaN check fires (the anomaly-latency
            # trade-off is the caller's to make).
            # Multi-process: the flush's jnp.stack over (replicated) global
            # arrays is a mesh COMPUTATION, and multi-controller JAX requires
            # every process to issue the same computations in the same order
            # — a wall-clock trigger fires at different steps on different
            # hosts and deadlocks the collective. Only the deterministic
            # (step-keyed) triggers are allowed there.
            if (due_ckpt or step == max_steps or stop.stop
                    or len(pending) >= flush_max_steps
                    or (single_proc
                        and time.monotonic() - t_last >= flush_secs)):
                flush()
            if due_ckpt:
                ckpt.save(
                    step, state, config=config_dict(cfg),
                    loader_position=loader_position() if loader_position else None,
                )
                last_saved = step
    finally:
        if profiling:
            import jax

            jax.profiler.stop_trace()
        try:
            flush()  # drain buffered metrics (may raise on a late anomaly)
        finally:
            if not single_proc:
                # Re-align processes before the final save: orbax serialize
                # waits on the last dispatched computations, and a freshly
                # compiled collective program dispatched with >30 s of
                # inter-process skew fails its Gloo rendezvous (observed on
                # the 1-core CI host). Coordination-service barrier — no
                # compile, no collective.
                from dinox_tpu.parallel.mesh import host_barrier

                try:
                    host_barrier("dinox_tpu:final_save")
                except Exception:
                    pass  # the save's own watchdog covers a truly dead peer
            # Final checkpoint — unless a periodic/emergency save covered it.
            if last_saved != step:
                ckpt.save(
                    step, state, config=config_dict(cfg),
                    loader_position=loader_position() if loader_position else None,
                    force=True,
                )
            ckpt.close()
            logger.close()
            stop.restore()
    if ckpt.wedged:
        # Training itself completed (metrics flushed above); only the
        # checkpoint channel is dead. Surface it so callers can exit with a
        # distinct status instead of hanging in interpreter teardown.
        raise CheckpointWedgedError(
            f"checkpoint save watchdog fired; state at step {step} NOT saved"
        )
    return state
