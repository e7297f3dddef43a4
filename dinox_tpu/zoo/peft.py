"""LoRA injection / adapter save+load, HF-peft compatible on disk.

API parity with reference zoo/peft.py (apply_lora / save_adapter /
load_adapter / count_parameters, DEFAULT_TARGET_MODULES, always-frozen
physics layers) — implemented natively as A/B factor pytrees inside the flax
model (dinox_tpu.models.lora) instead of wrapping HF peft. The on-disk
format IS the HF peft format (adapter_model.safetensors with
``base_model.model.<path>.lora_{A,B}.weight`` keys + adapter_config.json),
so ~5 MB reference adapters flow unchanged in both directions (the
north-star requirement, SURVEY.md §7).
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import LoadedModel

log = logging.getLogger(__name__)

DEFAULT_TARGET_MODULES = ["qkv", "proj", "fc1", "fc2"]

# Always frozen during LoRA fine-tuning: the physics/tokenization substrate
# (reference zoo/peft.py:45-54). Adapters learn pathology, not physics.
FROZEN_SUBTREES = ("scale_embed", "patch_embed")
FROZEN_LEAVES = ("cls_token", "pos_embed", "registers")


class LoraModel(LoadedModel):
    """A LoadedModel whose config carries LoRA factors; exposes the
    trainable-mask and adapter-extraction helpers."""

    def trainable_mask(self) -> dict:
        """Pytree of bools: True only for lora_A/lora_B leaves."""

        def walk(tree, path=()):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return path[-1] in ("lora_A", "lora_B")

        return walk(self.params)

    def adapter_params(self) -> dict[str, np.ndarray]:
        """Flat {flax/path/lora_A: array} of just the adapter factors."""
        out: dict[str, np.ndarray] = {}

        def walk(tree, path=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                elif k in ("lora_A", "lora_B"):
                    out["/".join(path + (k,))] = np.asarray(v)

        walk(self.params)
        return out


def apply_lora(
    model: LoadedModel,
    *,
    rank: int = 8,
    alpha: float = 16.0,
    target_modules: Optional[list[str]] = None,
    dropout: float = 0.05,
) -> LoraModel:
    """Inject fresh (no-op: B=0) LoRA factors into a loaded backbone.

    Returns a LoraModel whose params contain lora_A/lora_B under every
    targeted qkv/proj/fc1/fc2 scope; base weights are byte-identical to the
    input model's. Training must use ``trainable_mask()`` so only adapters
    (plus any external task head) receive updates — the physics layers
    (scale_embed, patch_embed, cls/pos/registers) are frozen by construction.

    MoE backbones: the default target set is attention-only (qkv/proj) —
    router and expert stacks carry no LoRA and stay frozen like every other
    non-adapter weight (routing is part of the pretrained computation
    structure, not a fine-tuning surface). Explicitly passing fc1/fc2 is
    allowed and adapts the *dense* blocks only (MoE blocks have no fc1/fc2).
    """
    if target_modules is None and model.cfg.moe_experts > 0:
        targets: tuple = ("qkv", "proj")
        log.info("MoE backbone: LoRA targets default to attention-only %s "
                 "(router/experts frozen)", list(targets))
    else:
        targets = tuple(target_modules or DEFAULT_TARGET_MODULES)
    unknown = set(targets) - set(DEFAULT_TARGET_MODULES)
    if unknown:
        raise ValueError(f"unknown target modules: {sorted(unknown)}")
    lora_cfg = model.cfg.replace(
        lora_rank=rank, lora_alpha=alpha, lora_dropout=dropout, lora_targets=targets
    )
    template = init_backbone(lora_cfg, jax.random.key(0))

    def merge(tpl, base):
        if isinstance(tpl, dict):
            return {
                k: merge(v, base.get(k)) if isinstance(base, dict) else v
                for k, v in tpl.items()
            }
        return tpl if base is None else jnp.asarray(base)

    params = merge(template, model.params)
    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    wrapped = LoraModel(lora_cfg, params)
    n_train = sum(int(np.asarray(v).size) for v in wrapped.adapter_params().values())
    log.info(
        "LoRA applied: rank=%d alpha=%.1f targets=%s — %d trainable / %d total (%.2f%%)",
        rank, alpha, list(targets), n_train, n_total, 100.0 * n_train / n_total,
    )
    return wrapped


# -- HF-peft on-disk format -------------------------------------------------

_PEFT_KEY = re.compile(r"^base_model\.model\.(.+)\.lora_([AB])\.weight$")


def _flax_path_to_peft(path: str) -> str:
    # blocks_3/attn/qkv -> blocks.3.attn.qkv
    parts = path.split("/")
    out = []
    for p in parts:
        m = re.fullmatch(r"blocks_(\d+)", p)
        out.append(f"blocks.{m.group(1)}" if m else p)
    return ".".join(out)


def _peft_path_to_flax(path: str) -> str:
    parts = []
    toks = path.split(".")
    i = 0
    while i < len(toks):
        if toks[i] == "blocks" and i + 1 < len(toks) and toks[i + 1].isdigit():
            parts.append(f"blocks_{toks[i + 1]}")
            i += 2
        else:
            parts.append(toks[i])
            i += 1
    return "/".join(parts)


def save_adapter(model: LoraModel, output_dir: str | Path) -> Path:
    """Write adapter_model.safetensors + adapter_config.json (HF peft layout,
    loadable by ``peft.PeftModel.from_pretrained`` against the reference's
    torch PatchViT)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = model.cfg
    sd: dict[str, np.ndarray] = {}
    for path, arr in model.adapter_params().items():
        flax_prefix, factor = path.rsplit("/", 1)
        peft_key = f"base_model.model.{_flax_path_to_peft(flax_prefix)}.{factor}.weight"
        # flax lora_A (in, r) -> peft lora_A.weight (r, in); lora_B (r, out) -> (out, r)
        sd[peft_key] = np.ascontiguousarray(arr.T.astype(np.float32))
    from safetensors.numpy import save_file

    save_file(sd, str(out / "adapter_model.safetensors"))
    (out / "adapter_config.json").write_text(
        json.dumps(
            {
                "peft_type": "LORA",
                "r": cfg.lora_rank,
                "lora_alpha": cfg.lora_alpha,
                "lora_dropout": cfg.lora_dropout,
                "target_modules": sorted(cfg.lora_targets),
                "bias": "none",
                "base_model_name_or_path": None,
                "task_type": None,
                "inference_mode": False,
            },
            indent=2,
        )
    )
    log.info("adapter -> %s (%d tensors)", out, len(sd))
    return out


def load_adapter(model: LoadedModel, adapter_dir: str | Path) -> LoraModel:
    """Load an HF-peft adapter directory onto a base backbone."""
    adapter_dir = Path(adapter_dir)
    cfg_json = json.loads((adapter_dir / "adapter_config.json").read_text())
    if cfg_json.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"unsupported peft_type: {cfg_json.get('peft_type')}")
    from safetensors.numpy import load_file

    sd = load_file(str(adapter_dir / "adapter_model.safetensors"))

    wrapped = apply_lora(
        model,
        rank=int(cfg_json["r"]),
        alpha=float(cfg_json["lora_alpha"]),
        target_modules=list(cfg_json.get("target_modules") or DEFAULT_TARGET_MODULES),
        dropout=float(cfg_json.get("lora_dropout", 0.0)),
    )
    params = jax.tree_util.tree_map(lambda x: x, wrapped.params)  # shallow copy tree
    n_loaded = 0
    for key, arr in sd.items():
        m = _PEFT_KEY.match(key)
        if not m:
            raise KeyError(f"unrecognized adapter key: {key}")
        flax_path = _peft_path_to_flax(m.group(1)).split("/")
        node = params
        for p in flax_path:
            node = node[p]
        node[f"lora_{m.group(2)}"] = jnp.asarray(np.asarray(arr).T, jnp.float32)
        n_loaded += 1
    log.info("loaded %d adapter tensors from %s", n_loaded, adapter_dir)
    return LoraModel(wrapped.cfg, params)


def merge_adapter(model: LoraModel) -> LoadedModel:
    """Fold A@B into the base kernels -> a plain (adapter-free) backbone."""
    scale = model.cfg.lora_alpha / model.cfg.lora_rank

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "lora_A" in tree:
            merged = dict(tree)
            a, b = np.asarray(tree["lora_A"]), np.asarray(tree["lora_B"])
            merged["kernel"] = jnp.asarray(np.asarray(tree["kernel"]) + scale * (a @ b))
            merged.pop("lora_A")
            merged.pop("lora_B")
            return merged
        return {k: walk(v) for k, v in tree.items()}

    plain_cfg = model.cfg.replace(lora_rank=0, lora_dropout=0.0)
    return LoadedModel(plain_cfg, walk(model.params))


def count_parameters(model: LoadedModel) -> dict[str, int]:
    """{'total': N, 'trainable': M} — trainable = LoRA factors only
    (reference zoo/peft.py:203-215)."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(model.params))
    trainable = 0
    if isinstance(model, LoraModel):
        trainable = sum(int(v.size) for v in model.adapter_params().values())
    return {"total": int(total), "trainable": int(trainable)}
