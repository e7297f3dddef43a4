"""In-loop training monitor: attention-energy heatmaps + collapse stats.

Parity with the reference's ``--monitor-every`` in-loop visualization
(scripts/phase5_big_run.py:1892-1976): every N optimizer steps, embed a fixed
probe batch with the CURRENT student, write input|heatmap previews, Gram
health stats and collapse telemetry into ``run_dir/monitor/``. (The
out-of-process variant that watches checkpoints is scripts/monitor.py.)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import PatchViT
from dinox_tpu.ops.augment import eval_transform
from dinox_tpu.train.losses import gram_matrix


class TrainingMonitor:
    def __init__(
        self,
        run_dir: str | Path,
        model_cfg: ModelConfig,
        probe_pixels: np.ndarray,  # (B, H, W, 3) uint16
        probe_spacing: np.ndarray,  # (B, 3)
        every: int = 1000,
        tensorboard: bool = True,
    ):
        self.dir = Path(run_dir) / "monitor"
        self.dir.mkdir(parents=True, exist_ok=True)
        # TB image summaries (reference writes its heatmaps to TB too,
        # phase5_big_run.py:1892-1976); a second SummaryWriter on the run dir
        # produces a separate event file TensorBoard merges with the scalars.
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(Path(run_dir)))
            except Exception:
                self._tb = None
        self.cfg = model_cfg
        self.every = every
        self._pixels = jnp.asarray(probe_pixels)
        self._spacing = jnp.asarray(probe_spacing) if model_cfg.scale_aware else None
        module = PatchViT(model_cfg)

        @jax.jit
        def embed(params, pixels, spacing):
            x = eval_transform(pixels, img_size=model_cfg.img_size)
            return module.apply({"params": params}, x, spacing)

        self._embed = embed

    def maybe_snapshot(self, step: int, student_params: dict) -> Optional[dict]:
        if self.every <= 0 or step % self.every:
            return None
        backbone = student_params.get("backbone", student_params.get("encoder"))
        if backbone is None:
            return None
        feats = np.asarray(self._embed(backbone, self._pixels, self._spacing))
        cls = feats[:, 0]
        n_patches = (self.cfg.img_size // self.cfg.patch) ** 2
        patches = feats[:, 1 : 1 + n_patches]
        gram = np.asarray(gram_matrix(jnp.asarray(patches[: min(4, len(patches))])))
        stats = {
            "step": step,
            "embed_std": float(cls.std(axis=0).mean()),
            "gram_mean": float(gram.mean()),
            "collapse_warning": bool(cls.std(axis=0).mean() < 0.01),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self.dir / "health.jsonl", "a") as f:
            f.write(json.dumps(stats) + "\n")

        # input | attention-energy side-by-side for the first probe sample
        side = self.cfg.img_size // self.cfg.patch
        energy = np.linalg.norm(patches[0], axis=-1).reshape(side, side)
        energy = (energy - energy.min()) / max(float(np.ptp(energy)), 1e-9)
        from PIL import Image

        size = 192
        heat = Image.fromarray((energy * 255).astype(np.uint8)).resize(
            (size, size), Image.NEAREST
        )
        raw = np.asarray(self._pixels[0, :, :, 1], np.float32)
        raw = (raw - raw.min()) / max(float(np.ptp(raw)), 1e-9)
        inp = Image.fromarray((raw * 255).astype(np.uint8)).resize((size, size))
        combo = Image.new("L", (size * 2 + 4, size), 255)
        combo.paste(inp, (0, 0))
        combo.paste(heat, (size + 4, 0))
        combo.save(self.dir / f"step_{step:07d}.png")

        if self._tb is not None:
            self._tb.add_image("monitor/input_vs_attention",
                               np.asarray(combo, np.uint8), step,
                               dataformats="HW")
            g0 = gram[0]
            g0 = (g0 - g0.min()) / max(float(np.ptp(g0)), 1e-9)
            self._tb.add_image("monitor/gram", (g0 * 255).astype(np.uint8),
                               step, dataformats="HW")
            self._tb.add_scalar("monitor/embed_std", stats["embed_std"], step)
            self._tb.add_scalar("monitor/gram_mean", stats["gram_mean"], step)
            self._tb.flush()
        return stats
