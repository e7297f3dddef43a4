"""Model loading/export: reference checkpoints in, JAX models out (and back).

API parity with reference zoo/hub.py: ``load_model`` dispatches over
(1) a training-checkpoint ``.pth`` file, (2) a hub-format directory
(``config.json`` + ``backbone.safetensors``/``backbone.pth``), (3) a
HuggingFace Hub id — and ``export_hub_checkpoint`` writes the hub format
readable by BOTH this package and the reference's torch loader.
"""

from __future__ import annotations

import json
import logging
from functools import cached_property
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.models.config import HUB_DEFAULT_CONFIG, ModelConfig
from dinox_tpu.models.vit import PatchViT, init_backbone
from dinox_tpu.zoo.interop import (
    jax_to_torch_backbone,
    migrate_state_dict,
    needs_migration,
    strip_prefix,
    torch_to_jax_backbone,
)

log = logging.getLogger(__name__)


class LoadedModel:
    """A PatchViT backbone + params, with a jitted forward.

    The stand-in for the reference's ``PatchViT`` nn.Module instance: carries
    the attributes the downstream API reads (``scale_aware``, ``img_size``,
    ``dim``, ``patch``) and is callable on NHWC float batches.
    """

    def __init__(self, cfg: ModelConfig, params: dict[str, Any]):
        self.cfg = cfg
        self.params = params

    # attribute parity with reference PatchViT
    @property
    def scale_aware(self) -> bool:
        return self.cfg.scale_aware

    @property
    def img_size(self) -> int:
        return self.cfg.img_size

    @property
    def dim(self) -> int:
        return self.cfg.dim

    @property
    def patch(self) -> int:
        return self.cfg.patch

    @cached_property
    def _apply(self):
        module = PatchViT(self.cfg)

        @jax.jit
        def fwd(params, x, spacing):
            return module.apply({"params": params}, x, spacing)

        @jax.jit
        def fwd_nospacing(params, x):
            return module.apply({"params": params}, x, None)

        return fwd, fwd_nospacing

    def __call__(
        self, x: jnp.ndarray, spacing: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x: (B, H, W, 3) float32 normalized; returns all tokens (B, N, dim)."""
        fwd, fwd_nospacing = self._apply
        if spacing is None:
            return fwd_nospacing(self.params, x)
        return fwd(self.params, x, spacing)


def _cfg_from_dict(config: dict[str, Any]) -> ModelConfig:
    """Accepts both this package's ModelConfig dicts and the reference's
    config.json / training-config formats."""
    merged = dict(HUB_DEFAULT_CONFIG)
    merged.update({k: v for k, v in config.items() if v is not None})
    if "gelu_approx" not in config:
        log.warning(
            "hub config has no 'gelu_approx' field: assuming exact erf GELU "
            "(torch-parity default for reference-format exports). A native "
            "checkpoint exported before this field existed but trained with "
            "tanh GELU needs \"gelu_approx\": true added to its config.json."
        )
    return ModelConfig(
        name=str(merged.get("name", "custom")),
        img_size=int(merged["img_size"]),
        patch=int(merged["patch"]),
        dim=int(merged["dim"]),
        depth=int(merged["depth"]),
        heads=int(merged["heads"]),
        mlp_ratio=float(merged["mlp_ratio"]),
        out_dim=int(merged.get("out_dim", 8192)),
        num_registers=int(merged.get("num_registers", 4)),
        scale_aware=bool(merged.get("scale_aware", False)),
        # Absent from reference-format configs -> exact erf (torch parity);
        # native exports carry the field explicitly (export_hub_checkpoint).
        gelu_approx=bool(merged.get("gelu_approx", False)),
        # Non-dense families (hub format v2, weights_format="jax"): the MoE
        # placement knobs travel with the checkpoint so a hub dir fully
        # specifies the architecture (reference configs never carry these).
        moe_experts=int(merged.get("moe_experts", 0)),
        moe_every=int(merged.get("moe_every", 2)),
        moe_capacity_factor=float(merged.get("moe_capacity_factor", 1.25)),
    )


def _flatten_tree(tree: dict[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    """Nested flax params -> flat {'blocks_3/moe/w1': array} dict (the
    JAX-native safetensors key layout; '/' never occurs in flax scope names)."""
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, path))
        else:
            out[path] = np.ascontiguousarray(np.asarray(v, dtype=np.float32))
    return out


def _unflatten_tree(flat: dict[str, Any]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _load_torch_payload(path: Path, *, trusted: bool = False) -> dict[str, Any]:
    """trusted=True (weights_only=False) only for local training checkpoints;
    hub-dir / downloaded .pth files stay weights_only=True so third-party
    pickles cannot execute code (reference zoo/hub.py:199 hardens the same path)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=not trusted)


def _shapes_match(tpl, got) -> bool:
    if isinstance(tpl, dict):
        return isinstance(got, dict) and all(
            k in got and _shapes_match(v, got[k]) for k, v in tpl.items()
        )
    return np.shape(got) == tpl.shape


def _fill_missing_params(params: dict, cfg: ModelConfig) -> dict:
    """Complete a partial tree (e.g. scale-aware model loaded from a
    scale-blind checkpoint) with freshly-initialized values — the analog of
    the reference's strict=False tolerance (zoo/hub.py:139-142). Any shape
    mismatch under scale_embed/ drops the whole subtree and reinitializes it
    (reference zoo/hub.py:139-141 — a differently-sized scale MLP must not
    brick the load); mismatches elsewhere raise."""
    template = init_backbone(cfg, jax.random.key(0))

    se = params.get("scale_embed")
    if se is not None and not _shapes_match(template.get("scale_embed", {}), se):
        log.warning(
            "scale_embed shape mismatch vs model config; dropping checkpoint "
            "scale_embed and reinitializing (zero-init output => no-op)"
        )
        params = {k: v for k, v in params.items() if k != "scale_embed"}

    def merge(tpl, got, path):
        if isinstance(tpl, dict):
            return {
                k: merge(v, got.get(k) if isinstance(got, dict) else None, f"{path}/{k}")
                for k, v in tpl.items()
            }
        if got is None:
            return tpl
        got = jnp.asarray(got, jnp.float32)
        if got.shape != tpl.shape:
            raise ValueError(
                f"shape mismatch at {path}: checkpoint {got.shape} vs model {tpl.shape}"
            )
        return got

    return merge(template, params, "")


def load_from_training_checkpoint(
    path: str | Path,
    *,
    config_override: Optional[dict[str, Any]] = None,
) -> LoadedModel:
    """Extract the student backbone from a reference-format training
    checkpoint ``.pth`` (behavior parity: zoo/hub.py:74-149 — config
    extraction incl. nested "model", key migration, backbone./head. handling,
    scale_embed drop on mismatch)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Checkpoint not found: {path}")
    payload = _load_torch_payload(path, trusted=True)

    config = dict(HUB_DEFAULT_CONFIG)
    ckpt_cfg = payload.get("config")
    if isinstance(ckpt_cfg, dict):
        if isinstance(ckpt_cfg.get("model"), dict):
            config.update(ckpt_cfg["model"])
        for k in ("img_size", "scale_aware"):
            if k in ckpt_cfg:
                config[k] = ckpt_cfg[k]
    if config_override:
        config.update(config_override)
    cfg = _cfg_from_dict(config)

    sd = payload.get("student", payload.get("model", payload))
    if needs_migration(sd):
        log.info("migrating legacy state-dict keys")
        sd = migrate_state_dict(sd)
    if any(k.startswith("backbone.") for k in sd):
        sd = strip_prefix(sd, "backbone.")
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}
    if not cfg.scale_aware:
        sd = {k: v for k, v in sd.items() if not k.startswith("scale_embed.")}

    params = torch_to_jax_backbone(sd)
    params = _fill_missing_params(params, cfg)
    log.info("loaded training checkpoint %s (dim=%d depth=%d scale_aware=%s)",
             path.name, cfg.dim, cfg.depth, cfg.scale_aware)
    return LoadedModel(cfg, params)


def load_from_hub_dir(model_dir: str | Path) -> LoadedModel:
    """Hub format: config.json + backbone.safetensors (preferred) or
    backbone.pth; strict load (zoo/hub.py:157-213).

    Two weight layouts, declared by config.json's ``weights_format``:
    ``"torch"`` (default; timm-style keys, bidirectionally reference-
    compatible) and ``"jax"`` (flat flax paths — the native format for
    families the torch architecture cannot express, e.g. MoE)."""
    model_dir = Path(model_dir)
    config_path = model_dir / "config.json"
    if not config_path.exists():
        raise FileNotFoundError(f"config.json not found in {model_dir}")
    config = json.loads(config_path.read_text())
    cfg = _cfg_from_dict(config)
    jax_format = config.get("weights_format", "torch") == "jax"

    st_path = model_dir / "backbone.safetensors"
    pth_path = model_dir / "backbone.pth"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st_path))
    elif pth_path.exists():
        if jax_format:
            raise FileNotFoundError(
                f"{model_dir}: weights_format='jax' requires backbone.safetensors "
                "(jax-native checkpoints are never written as torch .pth)"
            )
        sd = _load_torch_payload(pth_path)
    else:
        raise FileNotFoundError(
            f"No weights in {model_dir}: expected backbone.safetensors or backbone.pth"
        )
    if jax_format:
        params = _unflatten_tree(sd)
    else:
        if needs_migration(sd):
            sd = migrate_state_dict(sd)
        params = torch_to_jax_backbone(sd)
    # strict: every model param must have come from the checkpoint
    params = jax.tree_util.tree_map(jnp.asarray, params)
    expected = jax.tree_util.tree_structure(init_backbone(cfg, jax.random.key(0)))
    got = jax.tree_util.tree_structure(params)
    if expected != got:
        raise ValueError(f"hub checkpoint does not match config: {got} vs {expected}")
    return LoadedModel(cfg, params)


def load_model(
    model_id_or_path: str | Path,
    *,
    config_override: Optional[dict[str, Any]] = None,
) -> LoadedModel:
    """3-way dispatch: .pth file -> training ckpt; dir with config.json ->
    hub dir; else HuggingFace Hub id (zoo/hub.py:221-269)."""
    p = Path(model_id_or_path)
    if p.is_file() and p.suffix == ".pth":
        return load_from_training_checkpoint(p, config_override=config_override)
    if p.is_dir() and (p / "config.json").exists():
        return load_from_hub_dir(p)
    from huggingface_hub import snapshot_download

    log.info("downloading from HuggingFace Hub: %s", model_id_or_path)
    return load_from_hub_dir(snapshot_download(str(model_id_or_path)))


def export_hub_checkpoint(
    model: LoadedModel,
    output_dir: str | Path,
    *,
    config: Optional[dict[str, Any]] = None,
    use_safetensors: bool = False,
) -> Path:
    """Write config.json + backbone weights in the hub format. The .pth
    variant is written with torch.save so the reference loader reads it
    unchanged (zoo/hub.py:277-327).

    Dense families export timm-style keys (reference-compatible both ways).
    Non-dense families (MoE) auto-select the JAX-native layout: flat flax
    paths in backbone.safetensors plus ``weights_format: "jax"`` and the MoE
    placement knobs in config.json — the torch .pth variant raises, since
    the reference torch architecture cannot express expert stacks."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    c = model.cfg
    jax_format = c.moe_experts > 0
    if jax_format and not use_safetensors:
        # Raise BEFORE any file is written so a failed export never leaves a
        # partial dir (a lone config.json would pass the hub-dir sniff).
        raise NotImplementedError(
            "torch interop is dense-only: MoE expert stacks have no torch "
            "analog in the reference architecture. Export with "
            "use_safetensors=True (JAX-native hub format, weights_format='jax')."
        )
    if config is None:
        config = {
            "img_size": c.img_size, "patch": c.patch, "dim": c.dim, "depth": c.depth,
            "heads": c.heads, "mlp_ratio": c.mlp_ratio, "num_registers": c.num_registers,
            "scale_aware": c.scale_aware, "gelu_approx": c.gelu_approx,
        }
    if jax_format:
        # Non-negotiable for loadability: even a caller-supplied config must
        # carry the weights format and MoE placement knobs, or the staged dir
        # reads back as torch-format and crashes on flat flax keys.
        config = dict(config)
        config.update({
            "weights_format": "jax",
            "moe_experts": c.moe_experts,
            "moe_every": c.moe_every,
            "moe_capacity_factor": c.moe_capacity_factor,
        })
    (out / "config.json").write_text(json.dumps(config, indent=2))
    host_params = jax.tree_util.tree_map(np.asarray, model.params)
    if jax_format:
        sd = _flatten_tree(host_params)
    else:
        sd = jax_to_torch_backbone(host_params)
    if use_safetensors:
        from safetensors.numpy import save_file

        # safetensors silently serializes the raw buffer of non-contiguous
        # arrays; force contiguity defensively.
        save_file(
            {k: np.ascontiguousarray(v) for k, v in sd.items()},
            str(out / "backbone.safetensors"),
        )
    else:
        import torch

        # np.array(..., order="C"): jax buffers surface as non-writable numpy
        # views; from_numpy on those triggers torch's non-writable warning.
        torch.save({k: torch.from_numpy(np.array(v, order="C")) for k, v in sd.items()},
                   out / "backbone.pth")
    log.info("exported hub checkpoint -> %s (%s layout)", out,
             "jax" if jax_format else "torch")
    return out
