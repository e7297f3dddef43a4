"""Native PNG decoder tests: PIL cross-validation, fallbacks, and parallel
decode throughput sanity."""

import io
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest
from PIL import Image

from dinox_tpu.data.png_native import decode_png16, native_available, read_png16


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native png decoder not built (no g++/zlib?)"
)


def png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_matches_pil_u16():
    arr = np.random.default_rng(0).integers(0, 65536, (64, 48), dtype=np.uint16)
    got = decode_png16(png_bytes(arr))
    np.testing.assert_array_equal(got, arr)


def test_decode_matches_pil_u8():
    arr = np.random.default_rng(1).integers(0, 256, (32, 32), dtype=np.uint8)
    got = decode_png16(png_bytes(arr))
    np.testing.assert_array_equal(got, arr.astype(np.uint16))


def test_gradient_exercises_all_filters():
    """Smooth gradients make PIL's encoder pick varied row filters."""
    y, x = np.mgrid[0:128, 0:128]
    arr = ((y * 131 + x * 7 + (x * y) % 251) % 65536).astype(np.uint16)
    got = decode_png16(png_bytes(arr))
    np.testing.assert_array_equal(got, arr)


def test_rejects_non_grayscale_gracefully():
    rgb = np.random.default_rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert decode_png16(png_bytes(rgb)) is None  # caller falls back to PIL


def test_rejects_garbage():
    assert decode_png16(b"not a png at all") is None
    assert read_png16("/nonexistent/file.png") is None


def test_native_not_slower_than_pil():
    arr = np.random.default_rng(3).integers(20000, 46000, (512, 512), dtype=np.uint16)
    data = png_bytes(arr)

    def time_n(fn, n=8, reps=5):
        # best-of-reps mean: a mean alone flakes whenever the scheduler
        # preempts one rep (observed under a concurrent chip-feed process);
        # the minimum is the standard noise-robust microbenchmark estimator.
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    t_native = time_n(lambda: decode_png16(data))
    t_pil = time_n(lambda: np.asarray(Image.open(io.BytesIO(data))))
    # allow generous slack; the point is the native path isn't a regression
    assert t_native < t_pil * 1.5, f"native {t_native:.4f}s vs PIL {t_pil:.4f}s"


@pytest.mark.skipif((__import__("os").cpu_count() or 1) < 4,
                    reason="needs multiple CPUs to observe thread scaling")
def test_parallel_decode_scales():
    """Decoding in 8 threads must beat 1 thread (GIL released in native code)."""
    arr = np.random.default_rng(3).integers(20000, 46000, (512, 512), dtype=np.uint16)
    data = png_bytes(arr)
    n = 48

    def work(_):
        return decode_png16(data)[0, 0]

    times = {}
    for workers in (1, 8):
        with ThreadPoolExecutor(workers) as pool:
            t0 = time.perf_counter()
            list(pool.map(work, range(n)))
            times[workers] = time.perf_counter() - t0
    assert times[8] < times[1] * 0.7, f"no parallel speedup: {times}"
