"""Embedding-server tests: health, embed round trip, bucket padding/chunking,
scale-aware spacing validation — against a live ThreadingHTTPServer on a
tiny backbone (CPU)."""

import importlib.util
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import jax
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import LoadedModel, export_hub_checkpoint

TINY = ModelConfig(name="tiny-serve", img_size=32, patch=16, dim=64, depth=2,
                   heads=2, out_dim=128, num_registers=4, scale_aware=True,
                   attn_impl="xla", dtype="float32")


def _load_serve():
    path = Path(__file__).resolve().parent.parent / "scripts" / "serve.py"
    spec = importlib.util.spec_from_file_location("serve_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    hub_dir = tmp_path_factory.mktemp("hub")
    model = LoadedModel(TINY, init_backbone(TINY, jax.random.key(0)))
    export_hub_checkpoint(model, hub_dir)

    serve = _load_serve()
    service = serve.EmbedService(str(hub_dir), buckets=[2, 4])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()
    service.close()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/embed", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["model"] == {"dim": 64, "img_size": 32, "scale_aware": True}
    assert body["buckets"] == [2, 4]


def test_embed_round_trip_and_padding_invariance(server):
    url, service = server
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-100, 400, (3, 40, 40)).astype(np.float32)
    sps = [[0.7, 0.7, 1.5], [1.0, 1.0, 3.0], [0.5, 0.5, 1.0]]
    code, body = _post(url, {"images": imgs.tolist(), "spacings": sps})
    assert code == 200
    emb = np.asarray(body["embeddings"], np.float32)
    assert emb.shape == (3, 64) and body["dim"] == 64
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # bucket padding must not change results: 3 images pad to bucket 4;
    # the same image alone pads to bucket 2
    solo = service.embed([imgs[0]], [sps[0]])
    np.testing.assert_allclose(solo[0], emb[0], atol=1e-5)


def test_embed_chunking_beyond_largest_bucket(server):
    _, service = server
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(-100, 400, (32, 32)).astype(np.float32) for _ in range(7)]
    sps = [[1.0, 1.0, 2.0]] * 7
    emb = service.embed(imgs, sps)  # 7 > largest bucket 4 -> chunked 4 + 3
    assert emb.shape == (7, 64)
    one = service.embed([imgs[5]], [sps[5]])
    np.testing.assert_allclose(one[0], emb[5], atol=1e-5)


def test_embed_missing_spacing_rejected(server):
    url, _ = server
    code, body = _post(url, {"images": [[[0.0] * 32] * 32]})
    assert code == 400 and "spacings" in body["error"]


def test_concurrent_requests_coalesce_into_one_forward(tmp_path):
    """N concurrent 1-image clients must share forwards: the dispatcher
    coalesces queued requests within the batch window instead of running N
    sequential lock-serialized forwards."""
    hub_dir = tmp_path / "hub"
    model = LoadedModel(TINY, init_backbone(TINY, jax.random.key(0)))
    export_hub_checkpoint(model, hub_dir)
    serve = _load_serve()
    # generous window: the assertion must hold on a loaded 1-CPU host
    service = serve.EmbedService(str(hub_dir), buckets=[4],
                                 batch_window_ms=500.0)
    try:
        rng = np.random.default_rng(2)
        imgs = rng.uniform(-100, 400, (4, 32, 32)).astype(np.float32)
        sp = [1.0, 1.0, 2.0]
        # solo reference BEFORE the race (its own forward)
        solo = service.embed([imgs[3]], [sp])
        base_forwards = service.stats["forwards"]
        results = [None] * 4
        barrier = threading.Barrier(4)

        def client(i):
            barrier.wait()
            results[i] = service.embed([imgs[i]], [sp])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results)
        made = service.stats["forwards"] - base_forwards
        served = 4
        assert made < served, (
            f"no coalescing: {made} forwards for {served} concurrent requests"
        )
        # fused-batch results must match a solo forward (padding invariance)
        np.testing.assert_allclose(results[3][0], solo[0], atol=1e-5)
    finally:
        service.close()


def test_fused_attn_flag_keeps_embeddings_identical(tmp_path):
    """--fused-attn is a runtime kernel choice, not a model change: the
    service must produce the same embeddings up to bf16 kernel tolerance
    (hub checkpoints load as pallas+bfloat16, so on CPU the config flip
    routes through the interpreted fused kernel — same 0.05 tolerance as
    the live-chip gate in bench.py --check)."""
    hub_dir = tmp_path / "hub"
    model = LoadedModel(TINY, init_backbone(TINY, jax.random.key(0)))
    export_hub_checkpoint(model, hub_dir)
    serve = _load_serve()

    base = serve.EmbedService(str(hub_dir), buckets=[2], batch_window_ms=0.0)
    fused = serve.EmbedService(str(hub_dir), buckets=[2], batch_window_ms=0.0,
                               fused_attn=True)
    try:
        assert fused.model.cfg.fused_attn and not base.model.cfg.fused_attn
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        sp = np.ones((2, 3), np.float32)
        eb = np.asarray(base.model(x, sp))
        ef = np.asarray(fused.model(x, sp))
        np.testing.assert_allclose(ef, eb, atol=0.05)
    finally:
        base.close()
        fused.close()


def test_close_never_strands_a_request(tmp_path):
    """Shutdown race (ADVICE r3): requests racing close() must either get a
    result or a 'shut down' error — never hang on future.result(). The
    submit lock guarantees the sentinel is the LAST queue item."""
    hub_dir = tmp_path / "hub"
    model = LoadedModel(TINY, init_backbone(TINY, jax.random.key(0)))
    export_hub_checkpoint(model, hub_dir)
    serve = _load_serve()
    service = serve.EmbedService(str(hub_dir), buckets=[2], batch_window_ms=0.0)
    rng = np.random.default_rng(3)
    img = rng.uniform(-100, 400, (32, 32)).astype(np.float32)
    sp = [1.0, 1.0, 2.0]
    service.embed([img], [sp])  # warm compile outside the race

    outcomes = [None] * 8
    barrier = threading.Barrier(9)

    def client(i):
        barrier.wait()
        try:
            outcomes[i] = service.embed([img], [sp]).shape
        except RuntimeError as e:
            outcomes[i] = str(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    barrier.wait()
    service.close()
    for t in threads:
        t.join(timeout=60)
    assert not any(t.is_alive() for t in threads), f"stranded: {outcomes}"
    for o in outcomes:
        assert o == (1, 64) or (isinstance(o, str) and "shut down" in o), o
