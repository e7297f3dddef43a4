#!/usr/bin/env python
"""Hardware bring-up gate (analog of reference
scripts/phase1_validate_attention.py): run fused attention on a large
sequence and verify numerics + throughput on the current backend. Exit 1 on
any failure.

    python scripts/validate_attention.py [--seq 1024 --dim 64 --heads 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dinox_tpu.ops.flash_attention import _xla_sdpa, flash_attention

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.default_rng(0)
    shape = (args.batch, args.heads, args.seq, args.dim)
    q, k, v = (jnp.asarray(rng.normal(size=shape), dtype) for _ in range(3))

    fn = jax.jit(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32)))
    ref = jax.jit(lambda q, k, v: jnp.sum(_xla_sdpa(q, k, v).astype(jnp.float32)))
    t0 = time.perf_counter()
    got = float(fn(q, k, v))
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s", flush=True)
    want = float(ref(q, k, v))
    rel = abs(got - want) / max(abs(want), 1e-9)
    ok = np.isfinite(got) and rel < 1e-2
    print(f"sum={got:.3f} ref={want:.3f} rel_diff={rel:.2e}", flush=True)

    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fn(q, k, v)
    float(out)
    dt = (time.perf_counter() - t0) / n
    flops = 4 * args.batch * args.heads * args.seq**2 * args.dim
    print(f"steady: {dt * 1e3:.2f} ms -> {flops / dt / 1e12:.1f} TFLOP/s", flush=True)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
