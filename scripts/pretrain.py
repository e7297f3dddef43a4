#!/usr/bin/env python
"""DINO-X TPU pretraining CLI — the analog of the reference's production
trainer (scripts/phase5_big_run.py), driving the jitted train step over the
host loader with checkpoint/resume, anomaly detection and metric sinks.

Examples:
    # Medical pretrain from an index CSV
    python scripts/pretrain.py --config vit-small --scale-aware \\
        --index-csv data/processed/_index/index.csv --batch-size 64 \\
        --max-steps 5000 --run-dir data/runs/mvp

    # Synthetic smoke run (no data needed)
    python scripts/pretrain.py --config vit-tiny --synthetic --max-steps 20 \\
        --batch-size 8 --run-dir /tmp/smoke
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import (
    enable_compilation_cache,
    respect_jax_platforms_env,
)

respect_jax_platforms_env()
enable_compilation_cache()


import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="vit-small",
                   choices=["vit-tiny", "vit-small", "vit-large", "vit-giant"])
    p.add_argument("--index-csv", type=Path, default=None)
    p.add_argument("--split-manifest", type=Path, default=None)
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--resume", default=None,
                   help="'auto' (latest run under run-dir's parent) or a run dir path")
    # model
    p.add_argument("--scale-aware", action="store_true")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--attn-impl", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--gelu", default="tanh", choices=["tanh", "exact"],
                   help="MLP GELU variant. Default tanh (quality-validated, "
                        "+23%% step speed, flax default); 'exact' is the "
                        "erf form matching torch nn.GELU for parity runs.")
    p.add_argument("--gelu-approx", action="store_true",
                   help=argparse.SUPPRESS)  # deprecated alias for --gelu tanh
    p.add_argument("--grad-checkpoint", action="store_true")
    p.add_argument("--fused-attn", action="store_true",
                   help="fused LN->QKV->attention->proj half-block Pallas "
                        "kernel (ops/fused_attn_block.py)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="Switch-style top-1 MoE MLP with N experts in every "
                        "--moe-every'th block (models/moe.py); 0 = dense")
    p.add_argument("--moe-every", type=int, default=2)
    p.add_argument("--moe-capacity", type=float, default=1.25,
                   help="expert capacity factor (tokens/expert multiplier)")
    p.add_argument("--moe-aux-weight", type=float, default=0.01,
                   help="Switch load-balance auxiliary loss weight")
    p.add_argument("--expert-parallel", type=int, default=1,
                   help="size of the `expert` mesh axis (requires "
                        "--moe-experts divisible by it)")
    p.add_argument("--sequence-parallel", action="store_true",
                   help="Megatron sequence parallelism: with "
                        "--model-parallel>1, shard the token axis over the "
                        "model axis in LN/residual regions (reduce-scatter/"
                        "all-gather boundaries instead of all-reduce)")
    # training
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--accumulation-steps", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--warmup-steps", type=int, default=2500)
    p.add_argument("--weight-decay", type=float, default=0.04)
    p.add_argument("--max-steps", type=int, default=5000,
                   help="schedule horizon AND default stop point")
    p.add_argument("--stop-after", type=int, default=None,
                   help="stop at this optimizer step while keeping the "
                        "--max-steps schedule horizon (for split/resumed runs)")
    p.add_argument("--ema", type=float, default=0.996)
    p.add_argument("--teacher-temp", type=float, default=0.04)
    p.add_argument("--student-temp", type=float, default=0.1)
    p.add_argument("--center-momentum", type=float, default=0.9)
    p.add_argument("--loss-type", default="dino", choices=["dino", "simclr", "mae"])
    p.add_argument("--gram-weight", type=float, default=1.0)
    p.add_argument("--koleo-weight", type=float, default=0.0)
    p.add_argument("--crop-scale-min", type=float, default=0.3)
    p.add_argument("--crop-scale-max", type=float, default=1.0)
    p.add_argument("--scale-lr-mult", type=float, default=1.0,
                   help="LR multiplier for the scale_embed (physics) params "
                        "— counterfactual-magnitude calibration knob")
    p.add_argument("--spacing-jitter", type=float, default=0.0,
                   help="sigma of per-view multiplicative lognormal jitter "
                        "on the spacing input (e.g. 0.1); damps local "
                        "spacing over-sensitivity while keeping the global "
                        "scale pathway")
    p.add_argument("--scale-gamma-init", type=float, default=1.0,
                   help="ScaleEmbedding LayerNorm gamma init (<1 starts the "
                        "spacing token at a proportionate share of the "
                        "residual stream — counterfactual calibration)")
    p.add_argument("--mu-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="AdamW first-moment storage dtype (math stays f32)")
    p.add_argument("--nu-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="AdamW second-moment storage dtype — required for "
                        "ViT-Giant on one 16GB chip; see the round-3 "
                        "moment-dtype validation in docs/EXPERIMENTS.md")
    p.add_argument("--ckpt-timeout", type=float, default=0.0,
                   help="watchdog (seconds) on every blocking checkpoint op; "
                        "0 disables. On a wedged device->host drain the save "
                        "is abandoned (loudly) instead of hanging the run; "
                        "the process exits rc=3 after training completes")
    p.add_argument("--factored-nu", action="store_true",
                   help="store the Adam second moment rank-1 factored "
                        "(Adafactor-style row/col EMAs) for >=2-D params — "
                        "nu memory ~free at any scale with f32 adaptive "
                        "scaling; alternative to --nu-dtype bfloat16")
    p.add_argument("--seed", type=int, default=0)
    # data
    p.add_argument("--z-stride", type=int, default=1)
    p.add_argument("--diverse-batches", action="store_true")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--device-prefetch", type=int, default=2,
                   help="host->device transfer lookahead for loader-fed runs "
                        "(batches staged ahead on device; 0 = transfer "
                        "inline in the step loop)")
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--decoded-cache", choices=["auto", "build", "off"],
                   default="auto",
                   help="write-once on-disk decoded-slice memmap beside the "
                        "index (data/slice_cache.py): auto = use if present, "
                        "build = decode once then use, off = always inflate "
                        "PNGs")
    p.add_argument("--synthetic-device-batches", type=int, default=0,
                   help="pre-stage this many synthetic batches ON DEVICE and "
                        "cycle them (no per-step H2D; for long synthetic runs)")
    p.add_argument("--synthetic-datasets", type=int, default=2,
                   help="number of synthetic dataset profiles for "
                        "--synthetic-device-batches (2=two-organ MVP, "
                        "up to 5 CT-catalog-like profiles)")
    p.add_argument("--signature-strength", type=float, default=1.0,
                   help="v2-profile dataset-signature strength for "
                        "--synthetic-datasets 5 (scaled_profiles_v2: 0 = "
                        "indistinguishable, 1 = v2 default, >1 = grosser); "
                        "match the eval set's make_synthetic_data "
                        "--signature-strength")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic on-the-fly batches (smoke/bench)")
    # ops
    p.add_argument("--ckpt-every", type=int, default=100)
    p.add_argument("--monitor-every", type=int, default=0,
                   help="in-loop attention/health snapshots every N steps (0=off)")
    p.add_argument("--ckpt-keep-last", type=int, default=5)
    p.add_argument("--log-json", action="store_true")
    p.add_argument("--metric-flush-steps", type=int, default=64,
                   help="max steps of device metrics buffered before the "
                        "NaN/collapse anomaly check runs — lower = earlier "
                        "emergency checkpoints, more device round-trips")
    p.add_argument("--metric-flush-secs", type=float, default=10.0,
                   help="wall-clock cadence of the metric drain")
    p.add_argument("--anomaly-spike-floor", type=float, default=0.0,
                   help="absolute loss headroom below which the relative "
                        "2x-mean spike warning is suppressed (0 = relative "
                        "only; ~0.5 recommended for long runs so converged-"
                        "scale jitter does not spam warnings)")
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps into "
                        "run_dir/profile (starts after --profile-start steps "
                        "so compilation is excluded)")
    p.add_argument("--profile-start", type=int, default=2)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--pipeline-parallel", type=int, default=1,
                   help="pipeline stages over a (data, pipe) mesh "
                        "(train/pp_step.py GPipe rotation); mutually "
                        "exclusive with --model-parallel")
    p.add_argument("--pp-microbatches", type=int, default=None,
                   help="pipeline microbatches (default: one per stage; more "
                        "shrinks the (S-1)/(M+S-1) bubble)")
    # multi-host (jax.distributed over DCN)
    p.add_argument("--dist-coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed "
                        "with --dist-processes/--dist-process-id")
    p.add_argument("--dist-processes", type=int, default=0)
    p.add_argument("--dist-process-id", type=int, default=-1)
    return p.parse_args(argv)


class SyntheticBatches:
    """Deterministic synthetic uint16 batches (the dry-run data path)."""

    def __init__(self, batch_size, accum, canvas, seed=0):
        self.batch_size, self.accum, self.canvas, self.seed = batch_size, accum, canvas, seed
        self._start = 0

    def seek(self, step: int) -> None:
        """See DeviceSyntheticBatches.seek: resume-phase alignment."""
        self._start = step

    def __iter__(self):
        from dinox_tpu.data.pipeline import Batch

        i = self._start
        while True:
            rng = np.random.default_rng((self.seed, i))
            yield Batch(
                pixels=rng.integers(
                    25000, 41000,
                    (self.accum, self.batch_size, self.canvas, self.canvas, 3),
                    dtype=np.uint16,
                ),
                spacing=rng.uniform(0.4, 3.0, (self.accum, self.batch_size, 3)).astype(np.float32),
                indices=np.arange(self.batch_size, dtype=np.int64),
            )
            i += 1


class DeviceSyntheticBatches:
    """Pre-staged ON-DEVICE synthetic batches, cycled.

    The dev tunnel moves ~27 MB/s host->device, so per-step host batches cap
    training at a fraction of a step per second; long synthetic runs (the 5K
    MVP ablation, the 50K five-dataset run) generate their data on the chip
    instead. n_datasets=2 keeps the original two-organ MVP generator
    bit-for-bit (organ A ~ thin-slice lung CT, organ B ~ thick-slice
    abdomen); n_datasets=5 samples the shared v2 CT-catalog profiles
    (dinox_tpu/data/synthetic.py) with temperature-style weights.
    """

    def __init__(self, n_batches, batch_size, accum, canvas, seed=0, n_datasets=2,
                 signature_strength=1.0):
        import jax
        import jax.numpy as jnp

        n = accum * batch_size

        @jax.jit
        def make_two_organ(key):
            k_org, k_low, k_sp1, k_sp2 = jax.random.split(key, 4)
            organ = jax.random.bernoulli(k_org, 0.5, (n,))
            low = jax.random.normal(k_low, (n, canvas // 16, canvas // 16, 3))
            img = jax.image.resize(low, (n, canvas, canvas, 3), "linear")
            # stored encoding: uint16 = HU + 32768 (SURVEY.md §2.4); HU clipped
            # to [-1000, 4000] like the on-disk twin (synth_two_organ_series_np)
            mean = jnp.where(organ, -600.0, 40.0)[:, None, None, None]
            std = jnp.where(organ, 300.0, 120.0)[:, None, None, None]
            hu = jnp.clip(mean + img * std, -1000.0, 4000.0)
            pixels = jnp.clip(hu + 32768.0, 0.0, 65535.0).astype(jnp.uint16)
            sp_a = jax.random.uniform(k_sp1, (n, 3),
                                      minval=jnp.asarray([0.5, 0.5, 1.0]),
                                      maxval=jnp.asarray([1.0, 1.0, 1.5]))
            sp_b = jax.random.uniform(k_sp2, (n, 3),
                                      minval=jnp.asarray([1.5, 1.5, 2.5]),
                                      maxval=jnp.asarray([3.0, 3.0, 5.0]))
            spacing = jnp.where(organ[:, None], sp_a, sp_b).astype(jnp.float32)
            return (pixels.reshape(accum, batch_size, canvas, canvas, 3),
                    spacing.reshape(accum, batch_size, 3))

        # v2 five-profile generator with window-invariant STRUCTURAL
        # signatures (dinox_tpu/data/synthetic.py) — shared with the on-disk
        # writer so eval sets are same-domain (round-3; v1's intensity-only
        # profiles collapsed post-windowing, probe 0.40).
        from dinox_tpu.data.synthetic import make_jax_batch_fn

        if n_datasets != 5 and n_datasets != 2:
            raise ValueError("--synthetic-datasets must be 2 (two-organ MVP) "
                             "or 5 (v2 CT-catalog profiles)")
        v2 = jax.jit(make_jax_batch_fn(
            canvas, n, signature_strength=signature_strength))

        def make_multi(key):
            pixels, spacing, _ds = v2(key)
            return (pixels.reshape(accum, batch_size, canvas, canvas, 3),
                    spacing.reshape(accum, batch_size, 3))

        make = make_two_organ if n_datasets == 2 else make_multi
        base = jax.random.key(seed)
        self._batches = [make(jax.random.fold_in(base, i)) for i in range(n_batches)]
        for px, sp in self._batches:
            px.block_until_ready()
        self._start = 0

    def seek(self, step: int) -> None:
        """Align the cycle phase with a resumed run: an uninterrupted run
        consumes batch (s-1) % n_batches at optimizer step s, so a run
        resumed at start_step must begin the cycle there — not at 0 — for
        the post-seam stream to match the uninterrupted one (the device
        analog of the disk loader's loader_epoch/loader_batch restore)."""
        self._start = step

    def __iter__(self):
        from dinox_tpu.data.pipeline import Batch

        i = self._start
        while True:
            px, sp = self._batches[i % len(self._batches)]
            yield Batch(pixels=px, spacing=sp, indices=None)
            i += 1


class AccumBatches:
    """Stack accumulation_steps micro-batches from the host loader into the
    (A, B, ...) layout the jitted step consumes."""

    def __init__(self, loader, accum):
        self.loader, self.accum = loader, accum

    def __iter__(self):
        from dinox_tpu.data.pipeline import Batch

        it = iter(self.loader)
        while True:
            micro = [next(it) for _ in range(self.accum)]
            yield Batch(
                pixels=np.stack([m.pixels for m in micro]),
                spacing=np.stack([m.spacing for m in micro]),
                indices=micro[0].indices,
            )


def data_manifest_hash(index_csv: Path) -> str:
    return hashlib.sha256(index_csv.read_bytes()).hexdigest()[:16]


# Kernel/runtime choices produce identical numerics and may differ between the
# original run and its resume; everything else in ModelConfig affects the
# compiled program's math and must come from the run being resumed.
_RUNTIME_ONLY_MODEL_FIELDS = {"attn_impl", "fused_attn", "fused_mlp",
                              "use_grad_checkpoint"}


def reconcile_resume_model_config(mcfg, stored: dict):
    """Resume continues the run it restores: numerics-affecting model fields
    are adopted from the run dir's stored config.json instead of the CLI
    rebuild — a run started with exact-erf GELU must not silently switch
    nonlinearity when resumed after a CLI-default change (ADVICE r3).
    Runtime-only kernel choices stay CLI-controlled. Every adopted
    difference is printed."""
    for k, v in stored.items():
        if k in _RUNTIME_ONLY_MODEL_FIELDS or not hasattr(mcfg, k):
            continue
        cur = getattr(mcfg, k)
        if isinstance(cur, tuple) and isinstance(v, list):
            v = tuple(v)
        if cur != v:
            print(f"resume: adopting stored model.{k}={v!r} (CLI had {cur!r})",
                  flush=True)
            mcfg = mcfg.replace(**{k: v})
    return mcfg


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax

    if args.dist_processes > 1:
        from dinox_tpu.parallel.mesh import init_distributed

        # must run before the first backend/device query
        init_distributed(args.dist_coordinator, args.dist_processes,
                         args.dist_process_id)

    from dinox_tpu.data.index import (
        exclude_val_series,
        load_index_rows,
        load_split_manifest,
        z_stride_subsample,
    )
    from dinox_tpu.data.pipeline import TrainLoader
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.parallel.mesh import make_mesh, state_shardings
    from dinox_tpu.train.checkpoint import CheckpointManager, find_latest_run
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step
    from dinox_tpu.train.trainer import train
    from dinox_tpu.zoo.lineage import get_git_commit

    mcfg = MODEL_CONFIGS[args.config].replace(
        scale_aware=args.scale_aware,
        attn_impl=args.attn_impl,
        use_grad_checkpoint=args.grad_checkpoint,
        fused_attn=args.fused_attn,
        sequence_parallel=args.sequence_parallel,
        moe_experts=args.moe_experts,
        moe_every=args.moe_every,
        moe_capacity_factor=args.moe_capacity,
        gelu_approx=args.gelu_approx or args.gelu == "tanh",
        scale_gamma_init=args.scale_gamma_init,
    )
    # Resolve resume BEFORE building state: the resumed run's stored model
    # config wins over CLI-rebuilt fields (reconcile_resume_model_config).
    resume_dir = None
    if args.resume == "auto":
        resume_dir = find_latest_run(args.run_dir.parent)
    elif args.resume:
        resume_dir = Path(args.resume)
    if resume_dir is not None and (resume_dir / "config.json").exists():
        stored_cfg = json.loads((resume_dir / "config.json").read_text())
        mcfg = reconcile_resume_model_config(mcfg, stored_cfg.get("model", {}))
    cfg = TrainConfig(
        model=mcfg,
        img_size=args.img_size,
        batch_size=args.batch_size,
        accumulation_steps=args.accumulation_steps,
        lr=args.lr,
        min_lr=args.min_lr,
        warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay,
        max_steps=args.max_steps,
        ema=args.ema,
        teacher_temp=args.teacher_temp,
        student_temp=args.student_temp,
        center_momentum=args.center_momentum,
        loss_type=args.loss_type,
        gram_weight=args.gram_weight,
        koleo_weight=args.koleo_weight,
        crop_scale_min=args.crop_scale_min,
        crop_scale_max=args.crop_scale_max,
        scale_lr_mult=args.scale_lr_mult,
        spacing_jitter=args.spacing_jitter,
        moe_aux_weight=args.moe_aux_weight,
        mu_dtype=args.mu_dtype,
        nu_dtype=args.nu_dtype,
        factored_nu=args.factored_nu,
        pipeline_parallel=args.pipeline_parallel,
        pp_microbatches=args.pp_microbatches,
        train_seed=args.seed,
    )

    print(f"devices={jax.devices()} backend={jax.default_backend()}", flush=True)
    print(f"config={args.config} params~{mcfg.params_millions:.1f}M "
          f"eff_batch={cfg.effective_batch_size} scale_aware={mcfg.scale_aware}", flush=True)
    provenance = {
        "git_commit": get_git_commit(Path(__file__).parent.parent),
        "data_manifest_hash": (
            data_manifest_hash(args.index_csv) if args.index_csv else "synthetic"
        ),
        "argv": sys.argv[1:],
    }

    # -- data ---------------------------------------------------------------
    if args.signature_strength != 1.0 and not (
            args.synthetic_device_batches > 0 and args.synthetic_datasets == 5):
        # Refuse rather than silently train at strength 1.0 against an eval
        # set generated at another strength — the arm comparison would be
        # invalid with no sign anything was wrong.
        print("error: --signature-strength only applies to "
              "--synthetic-device-batches with --synthetic-datasets 5; for "
              "on-disk data regenerate the tree with make_synthetic_data "
              "--signature-strength instead", file=sys.stderr)
        return 2
    loader = None
    if args.synthetic_device_batches > 0:
        batches = DeviceSyntheticBatches(
            args.synthetic_device_batches, args.batch_size,
            args.accumulation_steps, args.canvas, args.seed,
            n_datasets=args.synthetic_datasets,
            signature_strength=args.signature_strength,
        )
        loader_position = None
    elif args.synthetic:
        batches = SyntheticBatches(
            args.batch_size, args.accumulation_steps, args.canvas, args.seed
        )
        loader_position = None
    else:
        if args.index_csv is None:
            print("error: --index-csv required unless --synthetic", file=sys.stderr)
            return 2
        rows = load_index_rows(args.index_csv, require_spacing=args.scale_aware)
        print(f"loaded_rows={len(rows)}", flush=True)
        if args.split_manifest and args.split_manifest.exists():
            before = len(rows)
            rows = exclude_val_series(rows, load_split_manifest(args.split_manifest))
            print(f"excluded_val_rows={before - len(rows)}", flush=True)
        rows = z_stride_subsample(rows, args.z_stride)
        # Multi-host sharding happens INSIDE TrainLoader (each host takes a
        # disjoint strided shard of the shared-seed epoch ORDER, keeping the
        # full row set for 2.5D neighbor lookup). Pre-sharding the rows with
        # shard_rows here would strip every other slice from the SeriesMap
        # and silently degenerate the (z-1, z, z+1) stacks to center copies.
        # --batch-size is GLOBAL (TrainConfig semantics: LR scaling,
        # samples/s); each host's loader feeds its 1/process_count shard,
        # assembled into the global array by put_global_batch.
        n_hosts = jax.process_count()
        if args.batch_size % n_hosts:
            print(f"error: --batch-size {args.batch_size} is the GLOBAL batch "
                  f"and must be divisible by process_count={n_hosts}",
                  file=sys.stderr)
            return 2
        decoded_cache = None
        if args.decoded_cache != "off":
            from dinox_tpu.data.slice_cache import (
                build_slice_cache, open_slice_cache)

            index_dir = Path(args.index_csv).parent
            if args.decoded_cache == "build":
                build_slice_cache(rows, args.canvas, index_dir,
                                  workers=args.num_workers)
            decoded_cache = open_slice_cache(index_dir, args.canvas)
            if decoded_cache is not None:
                print(f"decoded-slice cache: {len(decoded_cache)} slices "
                      f"@{args.canvas} (zlib inflate off the hot path)",
                      flush=True)
        loader = TrainLoader(
            rows,
            args.batch_size // n_hosts,
            seed=args.seed,
            canvas=args.canvas,
            diverse=args.diverse_batches,
            num_workers=args.num_workers,
            host_id=jax.process_index(),
            num_hosts=jax.process_count(),
            decoded_cache=decoded_cache,
        )
        batches = AccumBatches(loader, args.accumulation_steps)
        loader_position = lambda: loader.position  # noqa: E731

    # -- state / resume -----------------------------------------------------
    # attn_impl="pallas" is multi-device-safe: Attention shard_maps the kernel
    # over the (data, model) mesh (ops/flash_attention.py:
    # flash_attention_packed_sharded), so model_parallel > 1 no longer forces
    # the XLA fallback.
    if args.pipeline_parallel > 1:
        # (data, pipe) mesh: transformer depth sharded over `pipe`, the GPipe
        # rotation of train/pp_step.py. Mutually exclusive with tensor
        # parallelism for now (parallel/pipeline.py module docstring).
        if args.model_parallel > 1:
            print("error: --pipeline-parallel and --model-parallel are "
                  "mutually exclusive", file=sys.stderr)
            return 2
        from dinox_tpu.parallel.pipeline import make_pp_mesh, pp_state_shardings
        from dinox_tpu.train.pp_step import build_pp_train_step, create_pp_train_state

        mesh = make_pp_mesh(jax.devices(), args.pipeline_parallel)
        state_shardings_fn = pp_state_shardings
    else:
        mesh = make_mesh(model_parallel=args.model_parallel,
                         expert_parallel=args.expert_parallel)
        state_shardings_fn = state_shardings
    if loader is not None and args.device_prefetch > 0:
        from dinox_tpu.data.prefetch import DevicePrefetcher

        # Stream upcoming batches to the device while the current step runs
        # (the trainer passes device-resident batches straight through).
        batches = DevicePrefetcher(batches, mesh=mesh,
                                   depth=args.device_prefetch)
    if args.pipeline_parallel > 1:
        state = create_pp_train_state(cfg, jax.random.key(args.seed), mesh)
    else:
        state = create_train_state(cfg, jax.random.key(args.seed))
        state = jax.device_put(state, state_shardings_fn(mesh, state))
    start_step = 0
    if resume_dir is not None and (resume_dir / "ckpt").exists():
        mgr = CheckpointManager(resume_dir, keep_last=args.ckpt_keep_last)
        state, meta = mgr.restore(state)
        mgr.close()
        state = jax.device_put(state, state_shardings_fn(mesh, state))
        start_step = int(meta["step"])
        print(f"resumed from {resume_dir} at step {start_step}", flush=True)
        if loader is not None:
            loader.epoch = meta.get("loader_epoch", 0)
            loader.batch_in_epoch = meta.get("loader_batch", 0)
        elif isinstance(batches, (DeviceSyntheticBatches, SyntheticBatches)):
            batches.seek(start_step)

    if args.pipeline_parallel > 1:
        step_fn = build_pp_train_step(cfg, mesh)
    else:
        step_fn = build_train_step(cfg, mesh=mesh)

    on_step = None
    if args.monitor_every > 0:
        from dinox_tpu.train.monitor_hook import TrainingMonitor

        rng_probe = np.random.default_rng(0)
        if loader is not None:
            n_probe = min(8, len(loader.source))
            probe_px = np.stack([loader.source.get(i)[0] for i in range(n_probe)])
            probe_sp = np.asarray(
                [[r.spacing_x, r.spacing_y, r.spacing_z]
                 for r in loader.source.rows[:n_probe]], np.float32,
            )
        else:
            probe_px = rng_probe.integers(
                25000, 41000, (8, args.canvas, args.canvas, 3), dtype=np.uint16
            )
            probe_sp = rng_probe.uniform(0.4, 3.0, (8, 3)).astype(np.float32)
        monitor = TrainingMonitor(
            args.run_dir, cfg.model.replace(img_size=cfg.img_size),
            probe_px, probe_sp, every=args.monitor_every,
            tensorboard=not args.no_tensorboard,
        )

        def on_step(step, _metrics, state):  # noqa: ANN001
            monitor.maybe_snapshot(step, state.student)

    args.run_dir.mkdir(parents=True, exist_ok=True)
    if jax.process_index() == 0:
        (args.run_dir / "provenance.json").write_text(json.dumps(provenance, indent=2))

    t0 = time.monotonic()
    stop_at = min(args.stop_after or args.max_steps, args.max_steps)
    from dinox_tpu.train.trainer import CheckpointWedgedError

    try:
        state = train(
            cfg,
            state,
            step_fn,
            batches,
            run_dir=args.run_dir,
            max_steps=stop_at,
            start_step=start_step,
            ckpt_every=args.ckpt_every,
            ckpt_keep_last=args.ckpt_keep_last,
            ckpt_timeout_s=args.ckpt_timeout,
            log_jsonl=args.log_json,
            flush_max_steps=args.metric_flush_steps,
            flush_secs=args.metric_flush_secs,
            anomaly_spike_floor=args.anomaly_spike_floor,
            tensorboard=not args.no_tensorboard,
            loader_position=loader_position,
            on_step=on_step,
            profile_steps=args.profile_steps,
            profile_start=args.profile_start,
            mesh=mesh,
        )
    except CheckpointWedgedError as e:
        # Training finished but the final state could not be drained; a
        # daemon thread is stuck inside the dead transfer channel, so a
        # normal interpreter exit could hang in teardown — force it.
        print(f"WEDGED-CHECKPOINT: {e}", flush=True)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)
    dt = time.monotonic() - t0
    steps_done = int(np.asarray(state.step)) - start_step
    if steps_done > 0 and dt > 0:
        print(f"done steps={steps_done} wall_s={dt:.1f} "
              f"steps_per_s={steps_done / dt:.3f} "
              f"samples_per_s={steps_done * cfg.effective_batch_size / dt:.1f}", flush=True)
    if loader is not None:
        loader.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
