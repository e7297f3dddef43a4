#!/usr/bin/env python
"""Inference / serving throughput benchmark.

The serving path is ``zoo.encode.encode_batch`` (the reference's inference
API, reference zoo/encode.py:182-227, re-architected as truly batched device
forwards). This bench times the jitted embed forward (window -> resize ->
normalize -> ViT -> CLS) on device-resident inputs across batch sizes and
reports the best img/s — the number a serving deployment planning capacity
actually needs. Host-side preprocessing is benched separately since on this
dev setup the ~27 MB/s tunnel dominates any H2D feeding (docs/PROFILING.md).

Usage: python scripts/bench_inference.py [--config vit-small] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import enable_compilation_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def slo_bench(args) -> int:
    """p50/p95 single-image request latency vs concurrency against the
    cross-request micro-batcher (scripts/serve.py EmbedService), plus the
    coalescing ratio its /healthz counters expose. Each client sends
    sequential 1-image requests — the serving pattern the batch window is
    designed for."""
    import importlib.util
    import tempfile
    import threading

    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.models.vit import init_backbone
    from dinox_tpu.zoo.hub import LoadedModel, export_hub_checkpoint

    spec = importlib.util.spec_from_file_location(
        "serve_cli", Path(__file__).resolve().parent / "serve.py")
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    cfg = MODEL_CONFIGS[args.config].replace(
        scale_aware=True, attn_impl=args.attn_impl, img_size=args.img_size,
        fused_attn=args.fused_attn,
    )
    rng = np.random.default_rng(0)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        export_hub_checkpoint(
            LoadedModel(cfg, init_backbone(cfg, jax.random.key(0))), td)
        service = serve.EmbedService(td, buckets=[1, 8, 32])
        try:
            service.warmup()
            img = rng.uniform(-400, 400, (args.img_size, args.img_size)
                              ).astype(np.float32)
            sp = [0.7, 0.7, 1.5]
            for conc in args.concurrency:
                f0, r0 = service.stats["forwards"], service.stats["requests"]
                lat: list[float] = []
                lock = threading.Lock()
                barrier = threading.Barrier(conc)

                def client():
                    barrier.wait()
                    mine = []
                    for _ in range(args.requests_per_client):
                        t0 = time.perf_counter()
                        service.embed([img], [sp])
                        mine.append(time.perf_counter() - t0)
                    with lock:
                        lat.extend(mine)

                threads = [threading.Thread(target=client) for _ in range(conc)]
                t_all = time.perf_counter()
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                wall = time.perf_counter() - t_all
                ms = np.sort(np.asarray(lat)) * 1000
                served = service.stats["requests"] - r0
                fwds = service.stats["forwards"] - f0
                rows.append({
                    "concurrency": conc,
                    "p50_ms": round(float(np.percentile(ms, 50)), 1),
                    "p95_ms": round(float(np.percentile(ms, 95)), 1),
                    "p99_ms": round(float(np.percentile(ms, 99)), 1),
                    "req_per_s": round(len(lat) / wall, 1),
                    "coalesce_ratio": round(served / max(fwds, 1), 2),
                })
                print(f"conc={conc}: p50={rows[-1]['p50_ms']}ms "
                      f"p95={rows[-1]['p95_ms']}ms "
                      f"{rows[-1]['req_per_s']} req/s "
                      f"coalesce={rows[-1]['coalesce_ratio']}x", flush=True)
        finally:
            service.close()
    top = rows[-1]
    print(json.dumps({
        "metric": f"{args.config.replace('-', '_')}_serve_p95_ms",
        "value": top["p95_ms"],
        "unit": "ms",
        "concurrency": top["concurrency"],
        "all": rows,
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="vit-small",
                   choices=["vit-tiny", "vit-small", "vit-large", "vit-giant"])
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[64, 128, 256, 512])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--attn-impl", default="pallas")
    p.add_argument("--fused-attn", action="store_true",
                   help="fused LN->QKV->attn->proj half-block kernel "
                        "(ops/fused_attn_block.py) — inference has no "
                        "backward, so its faster forward applies cleanly")
    p.add_argument("--slo", action="store_true",
                   help="latency-SLO mode: p50/p95 per-request latency vs "
                        "concurrency against the serve.py micro-batcher "
                        "(EmbedService), instead of raw forward throughput")
    p.add_argument("--concurrency", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--requests-per-client", type=int, default=25)
    args = p.parse_args(argv)

    if args.slo:
        return slo_bench(args)

    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.models.vit import PatchViT

    cfg = MODEL_CONFIGS[args.config].replace(
        scale_aware=True, attn_impl=args.attn_impl, img_size=args.img_size,
        fused_attn=args.fused_attn,
    )
    module = PatchViT(cfg)
    rng = np.random.default_rng(0)
    params = module.init(
        jax.random.key(0),
        jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32),
        jnp.ones((1, 3), jnp.float32),
    )["params"]

    def embed(params, x, spacing):
        feats = module.apply({"params": params}, x, spacing)
        cls = feats[:, 0, :]
        return cls / jnp.maximum(
            jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12
        )

    # block_until_ready under-reports over the axon tunnel (docs/PROFILING.md)
    # -> time ONE jitted fori_loop of `steps` forwards with a carried checksum
    # and a real host fetch at the end. The per-iteration input perturbation
    # stops XLA hoisting the loop-invariant forward out of the loop.
    import functools

    @functools.partial(jax.jit, static_argnums=3)
    def embed_loop(params, x, spacing, steps):
        def body(i, acc):
            cls = embed(params, x * (1.0 + i.astype(jnp.float32) * 1e-6), spacing)
            return acc + cls.sum(dtype=jnp.float32)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

    results = []
    for bs in args.batch_sizes:
        x = jax.device_put(
            rng.normal(0.0, 1.0, (bs, args.img_size, args.img_size, 3)).astype(np.float32)
        )
        sp = jax.device_put(rng.uniform(0.4, 3.0, (bs, 3)).astype(np.float32))
        try:
            checksum = float(embed_loop(params, x, sp, args.steps))  # compile+run
        except jax.errors.JaxRuntimeError as e:  # OOM at large bs: record, continue
            print(f"bs={bs}: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        assert np.isfinite(checksum), f"non-finite embed checksum at bs={bs}: {checksum}"
        t0 = time.perf_counter()
        checksum = float(embed_loop(params, x, sp, args.steps))
        dt = (time.perf_counter() - t0) / args.steps
        img_s = bs / dt
        results.append({"batch_size": bs, "img_per_sec": round(img_s, 1),
                        "latency_ms": round(dt * 1000, 2)})
        print(f"bs={bs}: {img_s:.0f} img/s, {dt * 1000:.2f} ms/batch", flush=True)

    if not results:
        print("no successful batch size", file=sys.stderr)
        return 1
    best = max(results, key=lambda r: r["img_per_sec"])
    print(json.dumps({
        "metric": f"{args.config.replace('-', '_')}_encode_img_per_sec",
        "value": best["img_per_sec"],
        "unit": "img/s",
        "batch_size": best["batch_size"],
        "all": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
