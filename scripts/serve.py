#!/usr/bin/env python
"""Reference embedding server: HTTP front-end over the zoo inference API.

The production-serving counterpart of ``zoo.encode`` (the reference's
inference surface, reference zoo/encode.py:82-227) with the deployment
patterns from docs/SERVING.md baked in: load once, jit once per batch
bucket, warm at startup, pad requests to fixed bucket shapes so XLA never
recompiles on a request. Stdlib-only (ThreadingHTTPServer) so it runs
anywhere the framework runs.

API:
  GET  /healthz          -> {"status": "ok", "model": {...}, "buckets": [...]}
  POST /embed            -> {"embeddings": [[...], ...], "dim": D}
    body: {"images": [[[...HU floats...]], ...],   # (H, W) each
           "spacings": [[sx, sy, sz], ...],        # required if scale-aware
           "input_format": "hu_float"|"hu16_png"|"windowed_float",
           "hu_level": 40.0, "hu_width": 400.0}

Usage:
    python scripts/serve.py --backbone path/to/hub_dir --port 8000 \
        --buckets 1 8 32
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import enable_compilation_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_compilation_cache()

import numpy as np


class EmbedService:
    """Bucketed batch embedding around a LoadedModel.

    Requests are padded up to the smallest bucket that fits (compiled once,
    warmed at startup); oversize requests are chunked by the largest bucket.
    """

    def __init__(self, backbone: str, buckets: list[int]):
        import jax.numpy as jnp

        from dinox_tpu.zoo.hub import load_model

        self.model = load_model(backbone)
        self.buckets = sorted(set(buckets))
        self._jnp = jnp
        self._lock = threading.Lock()  # one device, serialize forwards

    def warmup(self) -> None:
        for b in self.buckets:
            x = np.zeros((b, self.model.img_size, self.model.img_size, 3), np.float32)
            sp = np.ones((b, 3), np.float32) if self.model.scale_aware else None
            t0 = time.perf_counter()
            np.asarray(self._forward(x, sp))
            print(f"warmup bucket={b}: {time.perf_counter() - t0:.1f}s", flush=True)

    def _forward(self, x: np.ndarray, spacing):
        jnp = self._jnp
        feats = self.model(jnp.asarray(x),
                           None if spacing is None else jnp.asarray(spacing))
        cls = feats[:, 0, :]
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)

    def embed(self, images, spacings, input_format="hu_float",
              hu_level=40.0, hu_width=400.0) -> np.ndarray:
        from dinox_tpu.zoo.encode import _preprocess

        if self.model.scale_aware and spacings is None:
            raise ValueError("model is scale-aware: 'spacings' is required")
        n = len(images)
        xs = np.stack([
            _preprocess(np.asarray(img, np.float32), self.model.img_size,
                        input_format, hu_level, hu_width)
            for img in images
        ])
        sp = (np.asarray(spacings, np.float32)
              if self.model.scale_aware else None)

        out = []
        start = 0
        with self._lock:
            while start < n:
                remaining = n - start
                bucket = next((b for b in self.buckets if b >= remaining),
                              self.buckets[-1])
                take = min(bucket, remaining)
                xb = np.zeros((bucket,) + xs.shape[1:], np.float32)
                xb[:take] = xs[start:start + take]
                spb = None
                if sp is not None:
                    spb = np.ones((bucket, 3), np.float32)
                    spb[:take] = sp[start:start + take]
                emb = np.asarray(self._forward(xb, spb), np.float32)
                out.append(emb[:take])
                start += take
        return np.concatenate(out, axis=0)


def make_handler(service: EmbedService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log -> stdout kv
            print(f"http {self.command} {self.path} {args[1] if len(args) > 1 else ''}",
                  flush=True)

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "not found"})
            m = service.model
            self._json(200, {
                "status": "ok",
                "model": {"dim": m.dim, "img_size": m.img_size,
                          "scale_aware": m.scale_aware},
                "buckets": service.buckets,
            })

        def do_POST(self):
            if self.path != "/embed":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                t0 = time.perf_counter()
                emb = service.embed(
                    req["images"], req.get("spacings"),
                    input_format=req.get("input_format", "hu_float"),
                    hu_level=float(req.get("hu_level", 40.0)),
                    hu_width=float(req.get("hu_width", 400.0)),
                )
                self._json(200, {
                    "embeddings": emb.tolist(),
                    "dim": int(emb.shape[1]),
                    "latency_ms": round((time.perf_counter() - t0) * 1000, 2),
                })
            except (KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": str(e)})

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", required=True,
                   help="hub dir / training .pth / HF hub id (zoo.load_model)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32])
    args = p.parse_args(argv)

    service = EmbedService(args.backbone, args.buckets)
    service.warmup()
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(dim={service.model.dim}, scale_aware={service.model.scale_aware})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down", flush=True)
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
