"""SSIM harness vs a brute-force per-window oracle + metric properties.

No trusted SSIM package ships in this image, so exactness is pinned the way
the repo pins warp/norm semantics: an explicit windowed-statistics oracle
implementing Wang et al. 2004 eq. (13) with the standard 11x11 sigma-1.5
gaussian weights, compared at interior pixels (border handling differs by
construction)."""

import numpy as np
import pytest

from rerevst_tpu.eval.ssim import (
    TemporalSSIMAccumulator,
    ssim,
    ssim_map,
    temporal_ssim,
)


def _gauss_kernel(n=11, sigma=1.5):
    ax = np.arange(n) - (n - 1) / 2.0
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(k, k)
    return k / k.sum()


def _oracle_ssim_at(a, b, y, x, k):
    """Wang 2004 SSIM at pixel (y, x) via explicit window statistics."""
    n = k.shape[0]
    h = n // 2
    wa = a[y - h:y + h + 1, x - h:x + h + 1].astype(np.float64)
    wb = b[y - h:y + h + 1, x - h:x + h + 1].astype(np.float64)
    mu_a = (k * wa).sum()
    mu_b = (k * wb).sum()
    var_a = (k * wa * wa).sum() - mu_a ** 2
    var_b = (k * wb * wb).sum() - mu_b ** 2
    cov = (k * wa * wb).sum() - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))


def test_matches_windowed_oracle(rng):
    a = (rng.random((32, 40)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.float64)
                + rng.standard_normal((32, 40)) * 20, 0, 255).astype(np.uint8)
    m = ssim_map(a, b)
    k = _gauss_kernel()
    for y, x in [(8, 8), (16, 20), (24, 33), (10, 15)]:
        want = _oracle_ssim_at(a, b, y, x, k)
        np.testing.assert_allclose(m[y, x], want, rtol=2e-4)


def test_identity_and_symmetry(rng):
    a = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    b = np.clip(a + rng.integers(-30, 30, a.shape), 0, 255).astype(np.uint8)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    assert ssim(a, b) == pytest.approx(ssim(b, a), abs=1e-6)
    assert ssim(a, b) < 1.0


def test_noise_monotonicity(rng):
    a = (rng.random((32, 32)) * 255).astype(np.uint8)
    prev = 1.0
    for sigma in (5, 20, 60):
        noisy = np.clip(a.astype(np.float64)
                        + rng.standard_normal(a.shape) * sigma,
                        0, 255).astype(np.uint8)
        s = ssim(a, noisy)
        assert s < prev
        prev = s


def test_masked_mean(rng):
    a = (rng.random((20, 20)) * 255).astype(np.uint8)
    b = np.clip(a + rng.integers(-40, 40, a.shape), 0, 255).astype(np.uint8)
    mask = np.zeros((20, 20), np.float32)
    mask[5:10, 5:10] = 1.0
    m = ssim_map(a, b)
    want = float(m[5:10, 5:10].mean())
    assert ssim(a, b, mask) == pytest.approx(want, rel=1e-6)


def test_temporal_ssim_static_clip(rng):
    frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    styled = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    originals = [frame] * 4
    clip = [styled] * 4
    out = temporal_ssim(clip, originals)
    # static clip, zero flow, identical styled frames -> perfect consistency
    assert out["tssim"] == pytest.approx(1.0, abs=1e-3)
    assert out["tssim_control"] == pytest.approx(1.0, abs=1e-3)

    acc = TemporalSSIMAccumulator()
    for o, s in zip(originals, clip):
        acc.push(o, s)
    got = acc.result()
    assert got["tssim"] == pytest.approx(out["tssim"], abs=1e-6)


def test_temporal_ssim_flicker_is_worse(rng):
    frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    originals = [frame] * 4
    base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    steady = [base] * 4
    flicker = [np.clip(base.astype(np.int16)
                       + rng.integers(-60, 60, base.shape), 0,
                       255).astype(np.uint8)
               for _ in range(4)]
    assert (temporal_ssim(flicker, originals)["tssim"]
            < temporal_ssim(steady, originals)["tssim"])
