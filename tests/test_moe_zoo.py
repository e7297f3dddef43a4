"""MoE families through the zoo distribution layer (round-5, VERDICT r4 #1).

The reference's defining property is that every trained model becomes a
shippable zoo artifact (reference zoo/hub.py:277-327, zoo/publish.py:55-175).
These tests pin that property for the MoE family the reference cannot
express: JAX-native hub format round-trip, encode parity, serve smoke,
torch-interop refusal with a clear message, release staging, and the
LoRA-on-MoE contract (attention-only adapters, router/experts frozen).
"""

import json

import jax
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import (
    LoadedModel,
    export_hub_checkpoint,
    load_from_hub_dir,
    load_model,
)

MOE_TINY = ModelConfig(
    name="tiny-moe", img_size=32, patch=16, dim=64, depth=2, heads=2,
    out_dim=128, num_registers=4, scale_aware=True, attn_impl="xla",
    dtype="float32", moe_experts=2, moe_every=2, moe_capacity_factor=1.25,
)


@pytest.fixture(scope="module")
def moe_model():
    return LoadedModel(MOE_TINY, init_backbone(MOE_TINY, jax.random.key(0)))


@pytest.fixture(scope="module")
def moe_hub_dir(moe_model, tmp_path_factory):
    out = tmp_path_factory.mktemp("moe_hub")
    export_hub_checkpoint(moe_model, out, use_safetensors=True)
    return out


def test_moe_hub_export_writes_jax_format(moe_hub_dir):
    cfg = json.loads((moe_hub_dir / "config.json").read_text())
    assert cfg["weights_format"] == "jax"
    assert cfg["moe_experts"] == 2 and cfg["moe_every"] == 2
    assert cfg["moe_capacity_factor"] == 1.25
    assert (moe_hub_dir / "backbone.safetensors").exists()
    assert not (moe_hub_dir / "backbone.pth").exists()


def test_moe_hub_roundtrip_bit_exact_and_forward_parity(moe_model, moe_hub_dir):
    loaded = load_from_hub_dir(moe_hub_dir)
    assert loaded.cfg.moe_experts == 2 and loaded.cfg.moe_every == 2
    orig = jax.tree_util.tree_leaves_with_path(moe_model.params)
    back = dict(jax.tree_util.tree_leaves_with_path(loaded.params))
    assert len(orig) == len(back)
    for path, leaf in orig:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(back[path]))
    # Forward parity incl. the routed blocks. Hub loads apply the default
    # compute-dtype policy (bf16; dtype is runtime policy, not architecture),
    # so the bit-exact comparison runs same-config; the f32 fixture is the
    # loose-tolerance sanity anchor.
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    sp = np.ones((2, 3), np.float32)
    same_cfg = LoadedModel(loaded.cfg, moe_model.params)
    np.testing.assert_array_equal(np.asarray(same_cfg(x, sp)),
                                  np.asarray(loaded(x, sp)))
    np.testing.assert_allclose(np.asarray(moe_model(x, sp)),
                               np.asarray(loaded(x, sp)), rtol=5e-2, atol=5e-2)


def test_moe_encode_through_hub_path(moe_hub_dir):
    from dinox_tpu.zoo.encode import encode

    model = load_model(moe_hub_dir)  # 3-way dispatch: dir w/ config.json
    img = np.random.default_rng(1).uniform(-1000, 400, (40, 40)).astype(np.float32)
    emb = np.asarray(encode(model, img, pixel_spacing=(0.7, 0.7),
                            slice_thickness=2.0))
    assert emb.shape == (1, MOE_TINY.dim)
    assert np.isfinite(emb).all()


def test_moe_torch_interop_refused_with_clear_message(moe_model, tmp_path):
    from dinox_tpu.zoo.interop import jax_to_torch_backbone

    with pytest.raises(NotImplementedError, match="dense-only"):
        export_hub_checkpoint(moe_model, tmp_path / "pth_dir")
    with pytest.raises(NotImplementedError, match="dense-only"):
        jax_to_torch_backbone(moe_model.params)


def test_moe_stage_release_safetensors_only(moe_model, tmp_path):
    from dinox_tpu.zoo.publish import stage_release

    staging = stage_release(
        moe_model, tmp_path / "staging", model_name="tiny-moe-test",
        training_config={"lr": 1e-4, "index_csv": "/home/x/index.csv"},
        eval_results={"view_retrieval_top1_ratio": 24.0},
    )
    assert (staging / "backbone.safetensors").exists()
    assert not (staging / "backbone.pth").exists()
    card = (staging / "README.md").read_text()
    assert "moe_experts" in card
    # the staged dir is itself loadable (what a hub consumer sees)
    reloaded = load_from_hub_dir(staging)
    assert reloaded.cfg.moe_experts == 2


def test_lora_on_moe_attn_only_default_and_adapter_roundtrip(moe_model, tmp_path):
    from dinox_tpu.zoo.peft import apply_lora, load_adapter, save_adapter

    wrapped = apply_lora(moe_model, rank=4, alpha=8.0)
    assert wrapped.cfg.lora_targets == ("qkv", "proj")
    paths = list(wrapped.adapter_params())
    assert paths, "no adapter factors injected"
    assert all("/attn/" in p for p in paths), f"non-attn adapters: {paths}"
    # router + experts are NOT trainable
    mask = wrapped.trainable_mask()
    moe_mask = mask["blocks_1"]["moe"]
    assert not any(jax.tree_util.tree_leaves(moe_mask))
    # base weights byte-identical
    np.testing.assert_array_equal(
        np.asarray(wrapped.params["blocks_1"]["moe"]["w1"]),
        np.asarray(moe_model.params["blocks_1"]["moe"]["w1"]))
    # adapter round-trips through the HF-peft on-disk format
    adapter_dir = save_adapter(wrapped, tmp_path / "adapter")
    reloaded = load_adapter(moe_model, adapter_dir)
    assert set(reloaded.cfg.lora_targets) == {"qkv", "proj"}
    for p, arr in wrapped.adapter_params().items():
        np.testing.assert_allclose(
            arr, reloaded.adapter_params()[p], rtol=1e-6, atol=1e-7)
    # the adapted model still runs
    x = np.zeros((1, 32, 32, 3), np.float32)
    out = np.asarray(reloaded(x, np.ones((1, 3), np.float32)))
    assert np.isfinite(out).all()


def test_moe_serve_smoke(moe_hub_dir):
    import importlib.util
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / "serve.py"
    spec = importlib.util.spec_from_file_location("serve_cli_moe", path)
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    service = serve.EmbedService(str(moe_hub_dir), buckets=[2])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = np.random.default_rng(2).uniform(
            -500, 400, (40, 40)).astype(np.float32)
        payload = {"images": [img.tolist()], "spacings": [[0.7, 0.7, 2.0]]}
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/embed",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        emb = np.asarray(body["embeddings"], np.float32)
        assert emb.shape == (1, MOE_TINY.dim) and np.isfinite(emb).all()
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    finally:
        httpd.shutdown()
        service.close()
