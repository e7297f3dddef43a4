"""Synthetic five-dataset CT generator v2 — shared by the on-disk writer
(scripts/preprocessing/make_synthetic_data.py) and the on-device staged-batch
generator (scripts/pretrain.py DeviceSyntheticBatches).

Why v2 (round-3, VERDICT r2 "what's missing" #2): the v1 profiles differed by
HU mean/std and texture mix only. The stored encoding decodes to deci-HU
(data/hu.py), so every v1 mean sat inside the eval window, and the random
window/width augmentation (reference phase5_big_run.py:476-480) explicitly
trains the model to be brightness/contrast invariant — after windowing the
five v1 profiles were nearly indistinguishable (dataset probe 0.40 vs the
reference's 1.000 on five real scanners, docs/run50k/panorgan_eval.json).
Real datasets differ *structurally*; v2 gives each profile a window-invariant
structural signature, the kind a CT reader actually sees:

  lidc_like      thin-slice lung: sparse bright specks/filaments (vessels,
                 nodules) on an airy background — sparse high-freq features
  mayo_like      low-dose chest: lung-like base under heavy iid pixel noise
                 — distinct noise spectrum
  pancreas_like  contrast abdomen: large smooth coarse blobs, few edges
  cq500_like     non-contrast head: bright skull-like ring + piecewise-smooth
                 interior — strong circular edge structure
  colon_like     CT colonography: directional periodic bands (haustral-fold
                 rhythm) — mid-freq oriented texture

Spacing v2 (VERDICT r2 eval-signature item): per-dataset z-spacing ranges now
OVERLAP substantially (real scanners do), so spacing is a weak dataset cue
instead of a shortcut — the scale pathway should encode scale without the
counterfactual metric exploding (reference magnitudes 0.055/0.107,
/root/reference/docs/EXPERIMENTS.md:767-775).

Both implementations (numpy per-series with z-coherent 3-D fields; JAX
batched for device staging) evaluate the same parametric formula:

  HU = mean + std*((1-mix)*coarse + mix*fine) + ring + bands + specks + noise
       (air outside the body ellipse)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "SynthProfile",
    "PROFILES_V2",
    "PROFILE_NAMES_V2",
    "SAMPLING_WEIGHTS_V2",
    "scaled_profiles_v2",
    "synth_series_np",
]


@dataclass(frozen=True)
class SynthProfile:
    """One dataset's generation parameters (all HU unless noted)."""

    name: str
    mean: float           # tissue background mean
    std: float            # blob-field contrast
    fine_mix: float       # 0 = coarse blobs only, 1 = fine texture only
    ring_amp: float       # skull-like ring amplitude (0 = off)
    band_amp: float       # oriented periodic band amplitude (0 = off)
    band_freq: float      # bands per unit radius (~canvas/2 pixels)
    speck_amp: float      # sparse bright speck amplitude (0 = off)
    speck_thresh: float   # threshold on the unit-variance fine field (higher
                          # = sparser specks)
    noise_std: float      # iid pixel noise sigma
    sp_min: tuple         # (x, y, z) spacing lower bound, mm
    sp_max: tuple         # (x, y, z) spacing upper bound, mm


# Ordered as sampled; weights echo descending catalog sizes (temperature-style
# T=2 over the five CT catalog entries, matching the v1 weights).
PROFILES_V2 = (
    SynthProfile("lidc_like", -600.0, 250.0, 0.75, 0.0, 0.0, 0.0,
                 900.0, 1.1, 25.0, (0.5, 0.5, 1.0), (1.0, 1.0, 3.5)),
    SynthProfile("pancreas_like", 40.0, 140.0, 0.15, 0.0, 0.0, 0.0,
                 0.0, 99.0, 20.0, (0.6, 0.6, 2.0), (1.0, 1.0, 5.0)),
    SynthProfile("cq500_like", 30.0, 90.0, 0.25, 1300.0, 0.0, 0.0,
                 0.0, 99.0, 15.0, (0.4, 0.4, 2.5), (0.8, 0.8, 6.0)),
    SynthProfile("mayo_like", -500.0, 220.0, 0.60, 0.0, 0.0, 0.0,
                 600.0, 1.4, 120.0, (0.5, 0.5, 1.0), (1.0, 1.0, 4.0)),
    SynthProfile("colon_like", -150.0, 160.0, 0.40, 0.0, 260.0, 9.0,
                 0.0, 99.0, 25.0, (0.6, 0.6, 1.5), (1.0, 1.0, 5.0)),
)
PROFILE_NAMES_V2 = tuple(p.name for p in PROFILES_V2)
SAMPLING_WEIGHTS_V2 = (0.36, 0.22, 0.18, 0.14, 0.10)


def scaled_profiles_v2(strength: float) -> tuple:
    """Per-dataset signature-strength knob (round-5 causal probe experiment).

    Returns the five v2 profiles with every *dataset-identifying* component
    scaled by ``strength`` around the cross-profile common point:

    * parametric stats (mean, std, fine_mix, noise_std) are linearly
      inter/extrapolated between each profile and the unweighted
      cross-profile average — at 0 all five datasets share one parametric
      profile, at 1 they are exactly PROFILES_V2, above 1 they spread apart;
    * structural marks (ring_amp, band_amp, speck_amp) are multiplied by
      ``strength`` directly (averaging would bleed e.g. the skull ring into
      every dataset);
    * spacing ranges, band_freq, and speck_thresh are left alone (spacing
      deliberately overlaps across datasets; frequencies/thresholds define
      *what* the mark is, amplitude defines how visible it is).

    The probe-degradation mechanism (docs/ROUND4_RESULTS.md: series signal
    crowds out weak parametric dataset signatures over long training) predicts
    dataset-probe accuracy ~1.0 at large strength, chance at 0, and the
    observed mid-range degradation at 1.
    """
    s = float(strength)
    if s == 1.0:
        return PROFILES_V2
    c_mean = float(np.mean([p.mean for p in PROFILES_V2]))
    c_std = float(np.mean([p.std for p in PROFILES_V2]))
    c_mix = float(np.mean([p.fine_mix for p in PROFILES_V2]))
    c_noise = float(np.mean([p.noise_std for p in PROFILES_V2]))
    out = []
    for p in PROFILES_V2:
        out.append(SynthProfile(
            name=p.name,
            # mean kept inside the HU clip range so an extrapolated profile
            # cannot degenerate into all-air / all-bone
            mean=float(np.clip(c_mean + s * (p.mean - c_mean), -950.0, 2000.0)),
            std=float(max(10.0, c_std + s * (p.std - c_std))),
            fine_mix=float(np.clip(c_mix + s * (p.fine_mix - c_mix), 0.0, 1.0)),
            ring_amp=p.ring_amp * s,
            band_amp=p.band_amp * s,
            band_freq=p.band_freq,
            speck_amp=p.speck_amp * s,
            speck_thresh=p.speck_thresh,
            noise_std=float(max(0.0, c_noise + s * (p.noise_std - c_noise))),
            sp_min=p.sp_min,
            sp_max=p.sp_max,
        ))
    return tuple(out)


def _resize3d(field: np.ndarray, shape: tuple[int, int, int]) -> np.ndarray:
    """Trilinear upsample via separable 1-D linear interpolation (numpy-only;
    avoids a scipy dependency)."""
    out = field.astype(np.float32)
    for axis, target in enumerate(shape):
        n = out.shape[axis]
        if n == target:
            continue
        pos = np.linspace(0, n - 1, target)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n - 1)
        frac = (pos - lo).astype(np.float32)
        a = np.take(out, lo, axis=axis)
        b = np.take(out, hi, axis=axis)
        bshape = [1] * out.ndim
        bshape[axis] = target
        f = frac.reshape(bshape)
        out = a * (1 - f) + b * f
    return out


def synth_series_np(
    profile: SynthProfile,
    rng: np.random.Generator,
    n_slices: int,
    size: int,
) -> np.ndarray:
    """One z-coherent synthetic series (n_slices, size, size) in true HU."""
    zdim = max(2, n_slices // 2)
    coarse = _resize3d(rng.normal(size=(zdim, size // 32, size // 32)),
                       (n_slices, size, size))
    fine = _resize3d(rng.normal(size=(zdim, size // 8, size // 8)),
                     (n_slices, size, size))
    base = (1.0 - profile.fine_mix) * coarse + profile.fine_mix * fine

    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    # mildly random body ellipse per series
    ax = rng.uniform(0.78, 0.92)
    ay = rng.uniform(0.70, 0.88)
    r2 = (xx / ax) ** 2 + (yy / ay) ** 2
    body = r2 < 1.0

    hu = profile.mean + profile.std * base
    if profile.ring_amp > 0:
        r = np.sqrt(r2)
        ring = np.exp(-((r - 0.9) ** 2) / (2 * 0.035 ** 2))
        hu = hu + profile.ring_amp * ring[None]
    if profile.band_amp > 0:
        theta = rng.uniform(0, np.pi)
        phase = rng.uniform(0, 2 * np.pi, n_slices)[:, None, None]
        proj = xx * np.cos(theta) + yy * np.sin(theta)
        hu = hu + profile.band_amp * np.sin(
            2 * np.pi * profile.band_freq * proj[None] + phase)
    if profile.speck_amp > 0:
        hu = hu + profile.speck_amp * np.maximum(fine - profile.speck_thresh, 0.0)
    hu = hu + rng.normal(0, profile.noise_std, hu.shape)
    hu = np.where(body[None], hu, -1000.0)
    return np.clip(hu, -1000, 4000).astype(np.float32)


def synth_two_organ_series_np(
    organ: str, rng: np.random.Generator, n_slices: int, size: int
) -> tuple[np.ndarray, tuple]:
    """On-disk twin of the device two-organ MVP generator
    (scripts/pretrain.py make_two_organ): a 16x-coarse gaussian field with
    the organ's intensity stats and spacing range — the same-domain eval
    substrate for the 5K MVP ablation (round-3; the round-2 ablation eval
    used a domain-shifted set, VERDICT r2 weak #3). Returns (HU volume,
    per-series spacing)."""
    if organ == "organa":
        mean, std = -600.0, 300.0
        sp_lo, sp_hi = (0.5, 0.5, 1.0), (1.0, 1.0, 1.5)
    elif organ == "organb":
        mean, std = 40.0, 120.0
        sp_lo, sp_hi = (1.5, 1.5, 2.5), (3.0, 3.0, 5.0)
    else:
        raise ValueError(f"unknown organ {organ!r} (organa|organb)")
    zdim = max(2, n_slices // 2)
    field = _resize3d(rng.normal(size=(zdim, size // 16, size // 16)),
                      (n_slices, size, size))
    hu = np.clip(mean + std * field, -1000, 4000).astype(np.float32)
    sp = rng.uniform(np.asarray(sp_lo), np.asarray(sp_hi))
    return hu, (float(sp[0]), float(sp[0]), float(sp[2]))


def draw_spacing(profile: SynthProfile, rng: np.random.Generator) -> tuple:
    """Per-series spacing draw from the (overlapping) v2 ranges."""
    lo = np.asarray(profile.sp_min, np.float32)
    hi = np.asarray(profile.sp_max, np.float32)
    sp = rng.uniform(lo, hi)
    return (float(sp[0]), float(sp[0]), float(sp[2]))  # square xy pixels


# -- JAX batched variant (device staging) ------------------------------------


def make_jax_batch_fn(canvas: int, n: int, signature_strength: float = 1.0):
    """Returns jit-able fn(key) -> (pixels_u16 (n, canvas, canvas, 3),
    spacing (n, 3), ds (n,)) sampling the five v2 profiles.

    The 3 channels emulate the 2.5D (z-1, z, z+1) stack: one shared
    in-plane field with per-channel jitter (z-coherent like the loader's
    neighbor stacks). Same parametric formula as synth_series_np, with all
    per-dataset parameters gathered from tables — no branching, one trace.
    ``signature_strength`` scales the per-dataset signatures
    (:func:`scaled_profiles_v2`); 1.0 is bit-identical to the v2 default.
    """
    import jax
    import jax.numpy as jnp

    profiles = scaled_profiles_v2(signature_strength)
    mean_t = jnp.asarray([p.mean for p in profiles])
    std_t = jnp.asarray([p.std for p in profiles])
    mix_t = jnp.asarray([p.fine_mix for p in profiles])
    ring_t = jnp.asarray([p.ring_amp for p in profiles])
    band_t = jnp.asarray([p.band_amp for p in profiles])
    bfreq_t = jnp.asarray([p.band_freq for p in profiles])
    speck_t = jnp.asarray([p.speck_amp for p in profiles])
    sthr_t = jnp.asarray([p.speck_thresh for p in profiles])
    noise_t = jnp.asarray([p.noise_std for p in profiles])
    spmin_t = jnp.asarray([p.sp_min for p in profiles])
    spmax_t = jnp.asarray([p.sp_max for p in profiles])
    w = np.asarray(SAMPLING_WEIGHTS_V2)
    weights = jnp.asarray(w / w.sum())

    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, canvas),
                          jnp.linspace(-1, 1, canvas), indexing="ij")

    # Per-element threefry bits are u32: a full (n, canvas, canvas, 3) draw
    # keeps many 4-byte temps alive at once (n=128 @ 512^2 needed 25.6 GB —
    # compile-time OOM on a 16 GB chip). Generate in chunks of <=16 slices
    # under lax.map so the working set is bounded by the chunk, not the batch.
    _CHUNK = 16

    def _block(key, m: int):
        ks = jax.random.split(key, 9)
        ds = jax.random.choice(ks[0], len(PROFILES_V2), (m,), p=weights)
        # bf16 fields halve the staging HBM transient (see round-2 note)
        coarse = jax.image.resize(
            jax.random.normal(ks[1], (m, canvas // 32, canvas // 32, 3),
                              jnp.bfloat16),
            (m, canvas, canvas, 3), "linear")
        fine = jax.image.resize(
            jax.random.normal(ks[2], (m, canvas // 8, canvas // 8, 3),
                              jnp.bfloat16),
            (m, canvas, canvas, 3), "linear")
        mix = mix_t[ds][:, None, None, None].astype(jnp.bfloat16)
        base = ((1.0 - mix) * coarse + mix * fine).astype(jnp.float32)

        # Independent keys for the two body-ellipse axes: reusing one key made
        # ay an affine function of ax on device, unlike the numpy writer
        # (synth_series_np) which draws them independently.
        ax = jax.random.uniform(ks[3], (m, 1, 1, 1), minval=0.78, maxval=0.92)
        ay = jax.random.uniform(ks[8], (m, 1, 1, 1), minval=0.70, maxval=0.88)
        r2 = (xx[None, :, :, None] / ax) ** 2 + (yy[None, :, :, None] / ay) ** 2
        body = r2 < 1.0

        hu = mean_t[ds][:, None, None, None] + std_t[ds][:, None, None, None] * base
        r = jnp.sqrt(r2)
        ring = jnp.exp(-((r - 0.9) ** 2) / (2 * 0.035 ** 2))
        hu = hu + ring_t[ds][:, None, None, None] * ring
        theta = jax.random.uniform(ks[4], (m, 1, 1, 1), maxval=np.pi)
        phase = jax.random.uniform(ks[5], (m, 1, 1, 3), maxval=2 * np.pi)
        proj = (xx[None, :, :, None] * jnp.cos(theta)
                + yy[None, :, :, None] * jnp.sin(theta))
        hu = hu + band_t[ds][:, None, None, None] * jnp.sin(
            2 * jnp.pi * bfreq_t[ds][:, None, None, None] * proj + phase)
        hu = hu + speck_t[ds][:, None, None, None] * jnp.maximum(
            fine.astype(jnp.float32) - sthr_t[ds][:, None, None, None], 0.0)
        hu = hu + noise_t[ds][:, None, None, None] * jax.random.normal(
            ks[6], hu.shape, jnp.float32)
        # Same HU clip as the numpy writer (synth_series_np): without it,
        # lung-like tails below -1000 / above 4000 appear on device but never
        # in on-disk eval sets — a device/disk distribution mismatch.
        hu = jnp.clip(jnp.where(body, hu, -1000.0), -1000.0, 4000.0)
        # stored encoding: uint16 = HU + 32768 (data/hu.py)
        pixels = jnp.clip(hu + 32768.0, 0.0, 65535.0).astype(jnp.uint16)
        u = jax.random.uniform(ks[7], (m, 3))
        spacing = (spmin_t[ds] + u * (spmax_t[ds] - spmin_t[ds])).astype(jnp.float32)
        spacing = spacing.at[:, 1].set(spacing[:, 0])  # square xy pixels
        return pixels, spacing, ds

    def make(key):
        if n <= _CHUNK:
            return _block(key, n)
        # Round up to whole chunks and slice the excess: a non-divisible n
        # must never fall back to one full-batch trace (that's the OOM the
        # chunking exists to prevent); the waste is < one chunk.
        nchunks = -(-n // _CHUNK)
        keys = jax.random.split(key, nchunks)
        px, sp, ds = jax.lax.map(lambda k: _block(k, _CHUNK), keys)
        return (px.reshape((nchunks * _CHUNK,) + px.shape[2:])[:n],
                sp.reshape((nchunks * _CHUNK, 3))[:n],
                ds.reshape((nchunks * _CHUNK,))[:n])

    return make
