"""HEALPix RING pixelization (chomp_tpu.healpix) — self-validation
without healpy: exact round-trip bijection, closed-form ring
structure, equal-area Monte Carlo — and the PixelSphereMask.from_healpix
ingestion path against the analytic spherical cap.
"""

import numpy as np
import pytest

from chomp_tpu.healpix import ang2pix_ring, npix, pix2ang_ring


@pytest.mark.parametrize("nside", [1, 2, 3, 4, 8, 16, 64])
def test_roundtrip_identity(nside):
    """ang2pix(pix2ang(p)) == p for EVERY pixel — a bijection check
    covering caps, belt, and both float-boundary rings (z = ±2/3,
    where arccos/cos round-off flips the branch; the cap closed form
    must continue consistently onto the boundary ring)."""
    p = np.arange(npix(nside))
    th, ph = pix2ang_ring(nside, p)
    np.testing.assert_array_equal(ang2pix_ring(nside, th, ph), p)


def test_ring_structure():
    """Pixel-center latitudes: monotone non-increasing z with pixel
    index, 4i pixels in cap ring i, 4 nside in belt rings, and the
    documented z values (caps 1 - i²/(3 nside²), belt 4/3 - 2i/(3 nside))."""
    nside = 8
    p = np.arange(npix(nside))
    th, _ = pix2ang_ring(nside, p)
    z = np.cos(th)
    assert np.all(np.diff(z) < 1e-12)          # rings north -> south
    ring_z, counts = np.unique(np.round(z, 12), return_counts=True)
    assert len(ring_z) == 4 * nside - 1
    counts = counts[::-1]                       # north first
    for i in range(1, nside):
        assert counts[i - 1] == 4 * i
        assert counts[-i] == 4 * i
    assert np.all(counts[nside - 1:3 * nside] == 4 * nside)
    z_sorted = np.sort(ring_z)[::-1]
    for i in range(1, nside):
        np.testing.assert_allclose(
            z_sorted[i - 1], 1.0 - i * i / (3.0 * nside**2), atol=1e-12)
    for i in range(nside, 3 * nside + 1):
        np.testing.assert_allclose(
            z_sorted[i - 1], 4.0 / 3.0 - 2.0 * i / (3.0 * nside),
            atol=1e-12)


def test_equal_area_mc():
    """Uniform random points land in each pixel with equal probability
    (the defining HEALPix property), max deviation consistent with
    Poisson over 12 nside² pixels."""
    rng = np.random.default_rng(0)
    nside, n = 16, 400000
    z = rng.uniform(-1.0, 1.0, n)
    ph = rng.uniform(0.0, 2.0 * np.pi, n)
    pix = ang2pix_ring(nside, np.arccos(z), ph)
    counts = np.bincount(pix, minlength=npix(nside))
    exp = n / npix(nside)
    assert np.max(np.abs(counts - exp)) / np.sqrt(exp) < 5.0


def test_from_healpix_cap():
    """A polar-cap mask painted in HEALPix (nside=64) ingested via
    PixelSphereMask.from_healpix reproduces the analytic cap at its
    effective radius to the pixelization level (pair function within
    5% of A2 — the healpix->iso-latitude double resampling adds edge
    jitter over the direct 4% case, pair normalization within 3%), and exact zero-lag
    anchors hold."""
    from chomp_tpu.curved import (PixelSphereMask, SphericalCapMask,
                                  curved_pair_normalization)

    nside = 64
    rad = np.radians(25.0)
    th, _ = pix2ang_ring(nside, np.arange(npix(nside)))
    hp_map = (th <= rad).astype(float)
    m = PixelSphereMask.from_healpix(hp_map)
    r_eff = np.arccos(1.0 - m.area2 / (2.0 * np.pi))
    assert abs(r_eff - rad) < 2.0 * np.pi / (4.0 * nside)
    ref = SphericalCapMask(r_eff)
    th_g = np.radians(np.linspace(0.3, 48.0, 100))
    dev = (m.pair_function(th_g) - ref.pair_function(th_g)) / ref.area2
    assert np.max(np.abs(dev)) < 0.05
    np.testing.assert_allclose(m.xi_w2(1.0), m.area4 / (4.0 * np.pi),
                               rtol=1e-12)
    edges = np.radians([1.0, 2.0, 4.0, 8.0])
    np.testing.assert_allclose(curved_pair_normalization(m, edges),
                               curved_pair_normalization(ref, edges),
                               rtol=3e-2)
    with pytest.raises(ValueError, match="12"):
        PixelSphereMask.from_healpix(np.ones(100))
