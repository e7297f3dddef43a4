"""Synthetic five-dataset generator v2: the profiles must stay separable
AFTER eval windowing + per-image standardization (the invariances the random
window augmentation trains into the model) — the property v1 lacked (dataset
probe 0.40, docs/run50k/panorgan_eval.json), and must keep overlapping
z-spacing ranges so spacing is not a dataset shortcut."""

import numpy as np
import pytest

from dinox_tpu.data.hu import window
from dinox_tpu.data.synthetic import (
    PROFILES_V2,
    SAMPLING_WEIGHTS_V2,
    make_jax_batch_fn,
    synth_series_np,
)

SIZE = 128


def _features(img01: np.ndarray) -> np.ndarray:
    """Window-invariant structural features of one windowed [0,1] slice."""
    x = (img01 - img01.mean()) / (img01.std() + 1e-6)
    gx = np.diff(x, axis=0)
    gy = np.diff(x, axis=1)
    grad = float(np.mean(np.abs(gx)) + np.mean(np.abs(gy)))
    hf = float(np.std(gx))
    speck = float(np.percentile(x, 99.7) - np.percentile(x, 75.0))
    # oriented mid-frequency band energy (colon's haustral rhythm)
    F = np.abs(np.fft.fftshift(np.fft.fft2(x)))
    h, w = F.shape
    ky, kx = np.meshgrid(np.arange(h) - h // 2, np.arange(w) - w // 2,
                         indexing="ij")
    kr = np.hypot(ky, kx)
    band = (kr >= 13) & (kr <= 23)
    band_peak = float(F[band].max() / (F[band].mean() + 1e-6))
    # skull ring: annulus brightness vs interior
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    r = np.hypot(yy, xx)
    ann = (r > 0.78) & (r < 0.95)
    inner = (r > 0.4) & (r < 0.65)
    ring = float(x[ann].mean() - x[inner].mean())
    return np.asarray([grad, hf, speck, band_peak, ring], np.float32)


def _probe_accuracy(feats: np.ndarray, labels: np.ndarray,
                    groups: np.ndarray) -> float:
    """Series-level split + logistic probe on standardized features."""
    from sklearn.linear_model import LogisticRegression

    uniq = np.unique(groups)
    rng = np.random.default_rng(0)
    rng.shuffle(uniq)
    test_groups = set(uniq[: max(1, len(uniq) // 4)].tolist())
    te = np.isin(groups, list(test_groups))
    mu, sd = feats[~te].mean(0), feats[~te].std(0) + 1e-6
    clf = LogisticRegression(max_iter=2000, random_state=0)
    clf.fit((feats[~te] - mu) / sd, labels[~te])
    return float(np.mean(clf.predict((feats[te] - mu) / sd) == labels[te]))


def test_np_profiles_separable_post_window():
    rng = np.random.default_rng(0)
    feats, labels, groups = [], [], []
    for li, prof in enumerate(PROFILES_V2):
        for s in range(8):
            vol = synth_series_np(prof, rng, n_slices=4, size=SIZE)
            for z in range(vol.shape[0]):
                feats.append(_features(window(vol[z] * 0.1, 40.0, 400.0)))
                labels.append(li)
                groups.append(li * 100 + s)
    acc = _probe_accuracy(np.stack(feats), np.asarray(labels), np.asarray(groups))
    assert acc >= 0.9, f"v2 profiles not separable post-window: probe acc {acc:.2f}"


def test_jax_generator_matches_contract():
    import jax

    n = 64
    make = jax.jit(make_jax_batch_fn(SIZE, n))
    pixels, spacing, ds = make(jax.random.key(0))
    pixels, spacing, ds = map(np.asarray, (pixels, spacing, ds))
    assert pixels.shape == (n, SIZE, SIZE, 3) and pixels.dtype == np.uint16
    assert set(ds.tolist()) >= {0, 1, 2}, "sampling should hit several datasets"
    for i in range(n):
        p = PROFILES_V2[ds[i]]
        assert (spacing[i] >= np.asarray(p.sp_min) - 1e-6).all()
        assert (spacing[i] <= np.asarray(p.sp_max) + 1e-6).all()
        assert spacing[i, 0] == spacing[i, 1]  # square xy pixels


def test_jax_generator_separable_post_window():
    """The actual device training data must carry the structural signatures
    too — probe on handcrafted features of the windowed center channel."""
    import jax

    n = 96
    make = jax.jit(make_jax_batch_fn(SIZE, n))
    feats, labels = [], []
    for i in range(3):
        pixels, _, ds = map(np.asarray, make(jax.random.key(i)))
        for j in range(n):
            hu_deci = (pixels[j, :, :, 1].astype(np.float32) - 32768.0) * 0.1
            feats.append(_features(window(hu_deci, 40.0, 400.0)))
            labels.append(int(ds[j]))
    feats = np.stack(feats)
    labels = np.asarray(labels)
    # iid samples: plain 75/25 split, still >=0.85 required
    rng = np.random.default_rng(0)
    order = rng.permutation(len(labels))
    cut = len(order) // 4
    te, tr = order[:cut], order[cut:]
    from sklearn.linear_model import LogisticRegression

    mu, sd = feats[tr].mean(0), feats[tr].std(0) + 1e-6
    clf = LogisticRegression(max_iter=2000, random_state=0)
    clf.fit((feats[tr] - mu) / sd, labels[tr])
    acc = float(np.mean(clf.predict((feats[te] - mu) / sd) == labels[te]))
    assert acc >= 0.85, f"device v2 data not separable post-window: {acc:.2f}"


def test_spacing_ranges_overlap_across_datasets():
    """Real scanners' spacing distributions overlap; v2 must not hand the
    model a spacing shortcut for dataset identity."""
    zlo = [p.sp_min[2] for p in PROFILES_V2]
    zhi = [p.sp_max[2] for p in PROFILES_V2]
    overlaps = 0
    pairs = 0
    for i in range(len(PROFILES_V2)):
        for j in range(i + 1, len(PROFILES_V2)):
            pairs += 1
            if min(zhi[i], zhi[j]) - max(zlo[i], zlo[j]) > 0.5:
                overlaps += 1
    assert overlaps == pairs, "every dataset pair must share >=0.5mm of z-range"
    assert abs(sum(SAMPLING_WEIGHTS_V2) - 1.0) < 1e-6


def test_signature_strength_identity_zero_and_monotone():
    """scaled_profiles_v2: strength 1 is the identity (bit-exact device
    batches), strength 0 collapses the five datasets to one common profile
    (no structural marks, shared parametric stats), and larger strength
    separates the windowed features further — the knob the round-5 causal
    probe experiment turns."""
    import jax

    from dinox_tpu.data.synthetic import scaled_profiles_v2

    assert scaled_profiles_v2(1.0) is PROFILES_V2
    make_ref = jax.jit(make_jax_batch_fn(64, 8))
    make_s1 = jax.jit(make_jax_batch_fn(64, 8, signature_strength=1.0))
    a, _, _ = make_ref(jax.random.key(3))
    b, _, _ = make_s1(jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat = scaled_profiles_v2(0.0)
    assert all(p.ring_amp == 0 and p.band_amp == 0 and p.speck_amp == 0
               for p in flat)
    assert len({(p.mean, p.std, p.fine_mix, p.noise_std) for p in flat}) == 1
    # spacing ranges untouched (spacing must stay a non-shortcut at every s)
    for p0, p1 in zip(flat, PROFILES_V2):
        assert p0.sp_min == p1.sp_min and p0.sp_max == p1.sp_max

    def spread(s):
        profs = scaled_profiles_v2(s)
        rng = np.random.default_rng(0)
        cents = []
        for prof in profs:
            vol = synth_series_np(prof, rng, n_slices=2, size=SIZE)
            cents.append(np.mean(
                [_features(window(z * 0.1, 40.0, 400.0)) for z in vol], axis=0))
        cents = np.stack(cents)
        cents = (cents - cents.mean(0)) / (cents.std(0) + 1e-6)
        return float(np.mean(np.linalg.norm(cents - cents.mean(0), axis=1)))

    # raw (unstandardized) mean-HU spread is the cleanest monotone readout
    def mean_spread(s):
        means = np.asarray([p.mean for p in scaled_profiles_v2(s)])
        return float(means.std())

    assert mean_spread(0.33) < mean_spread(1.0) < mean_spread(2.0)
    assert spread(2.0) > 0  # scaled profiles still generate valid series


def test_jax_batch_fn_chunking_shapes_and_determinism():
    """The device generator chunks >16-slice batches through lax.map (full
    single-trace generation compile-OOMs at (128,512,512,3) on a 16 GB
    chip); non-divisible n pads to whole chunks and slices. Shapes, label
    range, and key-determinism must hold at every branch: single-block,
    exact chunks, padded chunks."""
    import jax
    import jax.numpy as jnp

    from dinox_tpu.data.synthetic import PROFILES_V2, make_jax_batch_fn

    for n in (8, 40, 64):
        make = jax.jit(make_jax_batch_fn(64, n))
        px, sp, ds = make(jax.random.key(1))
        assert px.shape == (n, 64, 64, 3) and px.dtype == jnp.uint16
        assert sp.shape == (n, 3) and ds.shape == (n,)
        assert int(jnp.max(ds)) < len(PROFILES_V2)
        px2, _, _ = make(jax.random.key(1))
        np.testing.assert_array_equal(np.asarray(px), np.asarray(px2))
