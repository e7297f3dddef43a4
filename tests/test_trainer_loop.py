"""Trainer-loop behavior tests: metric sinks, anomaly handling, emergency
checkpoints, and the public zoo API surface."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.data.pipeline import Batch
from dinox_tpu.train.anomaly import AnomalyDetector
from dinox_tpu.train.state import TrainConfig, TrainState, create_train_state
from dinox_tpu.train.trainer import train
from tests.test_train_step import TINY


def make_batches(n=100):
    rng = np.random.default_rng(0)

    def gen():
        while True:
            yield Batch(
                pixels=rng.integers(30000, 36000, (1, 4, 32, 32, 3), dtype=np.uint16),
                spacing=np.ones((1, 4, 3), np.float32),
                indices=np.arange(4),
            )

    return gen()


def fake_step(loss_values):
    """A step_fn stub cycling through scripted loss values."""
    it = iter(loss_values)

    def step_fn(state, pixels, spacing):
        loss = next(it)
        new_state = TrainState(
            step=state.step + 1, student=state.student, teacher=state.teacher,
            opt_state=state.opt_state, center=state.center,
        )
        return new_state, {"loss": jnp.float32(loss), "embed_std": jnp.float32(0.5)}

    return step_fn


@pytest.fixture
def tiny_state():
    import jax

    return create_train_state(TINY.replace(batch_size=4), jax.random.key(0))


def test_train_loop_logs_and_checkpoints(tmp_path, tiny_state):
    cfg = TINY.replace(batch_size=4)
    state = train(
        cfg, tiny_state, fake_step([1.0] * 10), make_batches(),
        run_dir=tmp_path / "run", max_steps=4, ckpt_every=2,
        log_jsonl=True, tensorboard=False,
    )
    assert int(state.step) == 4
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 4 and json.loads(lines[0])["step"] == 1
    assert (tmp_path / "run" / "config.json").exists()
    steps = sorted(int(d.name) for d in (tmp_path / "run" / "ckpt").iterdir()
                   if d.name.isdigit())
    assert steps == [2, 4]


def test_train_loop_nan_triggers_emergency(tmp_path, tiny_state):
    cfg = TINY.replace(batch_size=4)
    with pytest.raises(FloatingPointError, match="anomaly"):
        train(
            cfg, tiny_state, fake_step([1.0, float("nan")]), make_batches(),
            run_dir=tmp_path / "run", max_steps=10, ckpt_every=0,
            tensorboard=False,
        )
    assert (tmp_path / "run" / "EMERGENCY.txt").exists()


def test_anomaly_detector_spike_and_collapse():
    det = AnomalyDetector(window=3, spike_factor=2.0)
    for _ in range(3):
        assert det.check(1.0, 0.5) == ("ok", "")
    sev, msg = det.check(5.0, 0.5)
    assert sev == "warn" and "spike" in msg
    sev, msg = det.check(1.0, 0.001)
    assert sev == "warn" and "collapse" in msg
    sev, _ = det.check(float("inf"), 0.5)
    assert sev == "fatal"


def test_anomaly_spike_floor_suppresses_converged_jitter():
    """At converged loss scale the relative 2x threshold alone fires on
    ~0.01-magnitude jitter (observed in the round-5 30K soak); an absolute
    spike_floor suppresses those while real spikes still warn."""
    det = AnomalyDetector(window=3, spike_factor=2.0, spike_floor=0.5)
    for _ in range(3):
        assert det.check(0.01, 0.5) == ("ok", "")
    # 3x the mean but only +0.02 absolute: below the floor -> ok
    assert det.check(0.03, 0.5) == ("ok", "")
    # a real spike clears both the relative factor and the floor
    sev, msg = det.check(1.0, 0.5)
    assert sev == "warn" and "spike" in msg
    # floor=0 keeps the pure-relative legacy behavior
    det0 = AnomalyDetector(window=3, spike_factor=2.0)
    for _ in range(3):
        det0.check(0.01, 0.5)
    sev, msg = det0.check(0.03, 0.5)
    assert sev == "warn" and "spike" in msg


def test_zoo_public_api_surface():
    """The lazy re-exports advertised by the zoo package all resolve."""
    import dinox_tpu.zoo as zoo

    for name in ("load_model", "encode", "encode_batch", "apply_lora",
                 "save_adapter", "load_adapter", "generate_model_card",
                 "publish_to_hub", "export_hub_checkpoint", "count_parameters"):
        assert callable(getattr(zoo, name)), name
    with pytest.raises(AttributeError):
        zoo.not_a_thing


def test_hardware_detection():
    from dinox_tpu.utils.hardware import detect_hardware

    hw = detect_hardware()
    assert hw.backend == "cpu"  # conftest forces cpu
    assert hw.num_devices == 8 and hw.batch_size_recommendation > 0


def _load_pretrain_module():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / "pretrain.py"
    spec = importlib.util.spec_from_file_location("pretrain_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_device_synthetic_batches_multi_dataset():
    """The 5-profile v2 generator yields dataset-correlated stats: the
    spacing distribution must span thin-slice (z<=1.6) and thick-slice
    (z>=2.4) draws, and per-sample HU means must form multiple intensity
    modes (v2 separability itself is covered by tests/test_synthetic.py's
    post-window probe — the intensity spread here is just a cheap
    diversity check)."""
    mod = _load_pretrain_module()
    gen = mod.DeviceSyntheticBatches(
        n_batches=2, batch_size=32, accum=1, canvas=32, seed=3, n_datasets=5
    )
    it = iter(gen)
    batch = next(it)
    assert batch.pixels.shape == (1, 32, 32, 32, 3)
    assert batch.pixels.dtype == jnp.uint16
    assert batch.spacing.shape == (1, 32, 3)

    sp_z = np.asarray(batch.spacing)[0, :, 2]
    assert (sp_z <= 1.6).any() and (sp_z >= 2.4).any()

    # per-sample mean HU (decoded): lung-like (-600 bg) vs soft-tissue
    # (+40/+30 bg) profiles still differ in the body interior, so the means
    # must spread by >150 HU even under the v2 air mask
    hu = np.asarray(batch.pixels[0], np.float32) - 32768.0
    means = hu.mean(axis=(1, 2, 3))
    assert means.max() - means.min() > 150.0

    # deterministic under the same seed
    gen2 = mod.DeviceSyntheticBatches(
        n_batches=2, batch_size=32, accum=1, canvas=32, seed=3, n_datasets=5
    )
    np.testing.assert_array_equal(
        np.asarray(batch.pixels), np.asarray(next(iter(gen2)).pixels)
    )


def test_device_synthetic_batches_two_organ_unchanged():
    """n_datasets=2 must keep the original two-organ generator bit-for-bit
    (the 5K MVP ablation's data path)."""
    mod = _load_pretrain_module()
    gen = mod.DeviceSyntheticBatches(
        n_batches=1, batch_size=8, accum=1, canvas=32, seed=0
    )
    px = np.asarray(next(iter(gen)).pixels)
    hu_means = px[0].astype(np.float32).mean(axis=(1, 2, 3)) - 32768.0
    # two organ modes: lung-like (~-600) and abdomen (~+40)
    assert ((hu_means < -300) | (hu_means > -150)).all()


def test_train_loop_anomaly_no_duplicate_flush(tmp_path, tiny_state):
    """A fatal anomaly raised from flush() must not replay the metric buffer
    in the cleanup path: each step logged once, the emergency checkpoint
    recorded under the trainer's true current step."""
    cfg = TINY.replace(batch_size=4)
    with pytest.raises(FloatingPointError, match="anomaly"):
        train(
            cfg, tiny_state, fake_step([1.0, float("nan"), 0.9]), make_batches(),
            run_dir=tmp_path / "run", max_steps=3, ckpt_every=0,
            tensorboard=False, log_jsonl=True,
        )
    lines = [json.loads(ln) for ln in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert len(steps) == len(set(steps)), f"duplicate metric rows: {steps}"
    emergency = (tmp_path / "run" / "EMERGENCY.txt").read_text()
    # the saved state is the trainer's current one (step 3, buffered flush) —
    # recorded under its own step so resume replays nothing; the message
    # names the earlier detection step
    assert "step=3" in emergency and "detected at step 2" in emergency


def test_zoo_encode_function_survives_submodule_import():
    """`encode` names both a submodule and the public function; importing
    the submodule binds it onto the package and must NOT shadow the
    function (regression: zoo.encode became the module under that import
    order and calls raised 'module is not callable')."""
    import dinox_tpu.zoo.encode  # noqa: F401  (binds submodule onto package)
    import dinox_tpu.zoo as zoo

    assert callable(zoo.encode) and callable(zoo.encode_batch)
    from dinox_tpu.zoo import encode

    assert callable(encode)


def test_reconcile_resume_model_config_adopts_stored_numerics():
    """Resume must adopt the stored run's numerics-affecting model fields
    (gelu_approx flipped defaults must not switch nonlinearity mid-run,
    ADVICE r3) while leaving runtime-only kernel choices CLI-controlled."""
    mod = _load_pretrain_module()
    from dinox_tpu.models.config import MODEL_CONFIGS

    cli = MODEL_CONFIGS["vit-tiny"].replace(
        gelu_approx=True, attn_impl="pallas", scale_aware=False)
    stored = {
        "gelu_approx": False,          # numerics: must be adopted
        "scale_aware": True,           # numerics: must be adopted
        "attn_impl": "xla",            # runtime-only: must NOT be adopted
        "fused_attn": True,            # runtime-only: must NOT be adopted
        "lora_targets": ["qkv", "proj", "fc1", "fc2"],  # list == tuple
        "not_a_field": 123,            # unknown keys ignored
    }
    out = mod.reconcile_resume_model_config(cli, stored)
    assert out.gelu_approx is False
    assert out.scale_aware is True
    assert out.attn_impl == "pallas"
    assert out.fused_attn is False
    assert out.lora_targets == ("qkv", "proj", "fc1", "fc2")


def test_metric_flush_window_bounds_anomaly_latency(tmp_path, tiny_state):
    """flush_max_steps=1 drains every step, so the NaN check fires on the
    very next step and the emergency save happens at the anomalous step
    itself (no 64-step buffering window)."""
    cfg = TINY.replace(batch_size=4)
    with pytest.raises(FloatingPointError, match="anomaly at step 2"):
        train(
            cfg, tiny_state, fake_step([1.0, float("nan"), 0.9]), make_batches(),
            run_dir=tmp_path / "run", max_steps=3, ckpt_every=0,
            tensorboard=False, log_jsonl=True, flush_max_steps=1,
        )
    emergency = (tmp_path / "run" / "EMERGENCY.txt").read_text()
    assert "step=2" in emergency


def test_model_flops_accounting():
    """Analytic FLOPs: ViT-S/224 forward ~12.5 GF/view, training slice = 8x;
    MFU scales linearly with rate."""
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.utils.flops import (
        forward_flops_per_view, mfu, train_flops_per_slice)

    s = MODEL_CONFIGS["vit-small"]
    f = forward_flops_per_view(s)
    assert 11e9 < f < 14e9
    assert train_flops_per_slice(s) == 8 * f
    assert mfu(200.0, s) == pytest.approx(2 * mfu(100.0, s))
    assert 0.0 < mfu(869.0, s) < 1.0


def test_moe_flops_accounting():
    """MoE FLOPs model mirrors models/moe.py's dense dispatch. The grouped
    (per-image) dispatch/combine einsums cost N/H of the expert FFN (~0.17 at
    ViT-S: 4*N*E*C*D vs 4*E*C*D*H) — the quantitative fact behind the
    round-4 GShard grouping fix (ungrouped, C grows with the global token
    count and the einsums dwarf the FFN; 128 vs 692 slices/s measured).
    Total grows with capacity_factor; dense configs are untouched."""
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.utils.flops import (
        forward_flops_per_view, moe_flops_per_view_per_block)

    s = MODEL_CONFIGS["vit-small"]
    moe = s.replace(moe_experts=4, moe_every=2, moe_capacity_factor=1.25)
    n, d, e = s.seq_len, s.dim, 4
    cap = max(1, int(n / e * 1.25))
    per_block = moe_flops_per_view_per_block(moe)
    einsums = 2.0 * 2.0 * n * e * cap * d
    ffn = 2.0 * e * cap * d * int(d * s.mlp_ratio) * 2
    assert per_block == pytest.approx(2.0 * n * d * e + einsums + ffn)
    assert einsums == pytest.approx(ffn * n / int(d * s.mlp_ratio))
    # MoE total exceeds dense (extra dispatch work at same nominal capacity)
    assert forward_flops_per_view(moe) > forward_flops_per_view(s)
    # monotone in capacity factor
    assert (forward_flops_per_view(moe.replace(moe_capacity_factor=2.0))
            > forward_flops_per_view(moe))
    # dense path untouched by the branch
    assert forward_flops_per_view(s.replace(moe_experts=0)) == \
        forward_flops_per_view(s)
