"""scripts/diagnose_scale_pathway.py: the VERDICT-#4 scale-pathway probe.

Pins the two facts the diagnostic is built on:
  - at zero-init the scale pathway is a strict no-op (counterfactual = 0),
  - the trailing LayerNorm pins the scale-token norm near sqrt(dim)*rms(gamma)
    as soon as fc2 moves off zero, however small the raw pre-LN signal is
    (the mechanism suspected behind the 10x counterfactual magnitude).
"""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import LoadedModel, export_hub_checkpoint

TINY = ModelConfig(name="tiny-diag", img_size=32, patch=16, dim=64, depth=2,
                   heads=2, out_dim=128, num_registers=4, scale_aware=True,
                   attn_impl="xla", dtype="float32")


def _load_cli():
    path = Path(__file__).resolve().parent.parent / "scripts" / "diagnose_scale_pathway.py"
    spec = importlib.util.spec_from_file_location("diag_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def diag():
    return _load_cli()


def test_zero_init_is_a_noop(diag, tmp_path):
    hub = tmp_path / "hub"
    export_hub_checkpoint(LoadedModel(TINY, init_backbone(TINY, jax.random.key(0))), hub)
    out = tmp_path / "diag.json"
    assert diag.main(["--checkpoint", str(hub), "--n", "8", "--canvas", "64",
                      "--out", str(out)]) == 0
    import json
    rep = json.loads(out.read_text())
    st = rep["scale_token"]
    assert st["post_ln_norm_mean"] == 0.0
    assert st["scale_vec_cosdist_2x"] is None  # rotation undefined at zero
    for v in rep["counterfactual"]["cosdist_vs_multiplier"].values():
        assert abs(v) < 1e-5
    assert rep["input_mix"]["scale_to_token_ratio"] == 0.0


def test_ln_pins_norm_once_fc2_clears_the_eps_floor(diag):
    # LN(x) = (x - mean)/sqrt(var + eps) * gamma: for per-dim std below
    # sqrt(eps) ~ 3e-3 the output scales linearly (amplified ~1/sqrt(eps));
    # once the raw signal clears that floor the output norm is PINNED at
    # ~sqrt(dim)*rms(gamma) no matter how small the raw signal stays in
    # absolute terms. A 1e-2 kernel produces a raw norm ~60x below the pin
    # yet a fully pinned output.
    params = init_backbone(TINY, jax.random.key(1))
    k = jax.random.normal(jax.random.key(2),
                          params["scale_embed"]["fc2"]["kernel"].shape) * 1e-2
    params["scale_embed"]["fc2"]["kernel"] = k
    model = LoadedModel(TINY, params)
    spacing = np.array([[0.7, 0.7, 1.25], [1.0, 1.0, 3.0]], np.float32)
    st = diag.scale_token_stats(model, spacing)
    # pre-LN signal is far below the pin, post-LN sits at it
    assert st["pre_ln_norm_mean"] < 0.2 * st["ln_pin_norm"]
    assert st["post_ln_norm_mean"] == pytest.approx(st["ln_pin_norm"], rel=0.1)
    # and the pinned vector genuinely rotates with spacing
    assert st["scale_vec_cosdist_2x"] > 1e-4
