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


def test_nest2ring_bijection_and_hierarchy():
    """NESTED ingestion, validated without healpy:
    (a) nest2ring is a bijection for several nside;
    (b) the nesting hierarchy: the 4 children of nested pixel p at
        2*nside have RING angles inside the parent's pixel at nside
        (ang2pix_ring of the child centers returns the parent's RING
        index) — this pins the bit-interleave and face layout against
        the independently-validated RING geometry;
    (c) face centers land on the known base-pixel positions."""
    from chomp_tpu.healpix import (ang2pix_ring, nest2ring, npix,
                                   pix2ang_ring, reorder_nest_to_ring)

    for nside in (1, 2, 4, 16):
        perm = nest2ring(nside, np.arange(npix(nside)))
        assert np.array_equal(np.sort(perm), np.arange(npix(nside)))

    for nside in (2, 8):
        p = np.arange(npix(nside))
        # children at the refined grid: 4p + (0..3)
        for c in range(4):
            child_nest = 4 * p + c
            th, ph = pix2ang_ring(2 * nside,
                                  nest2ring(2 * nside, child_nest))
            parent_ring = ang2pix_ring(nside, th, ph)
            assert np.array_equal(parent_ring, nest2ring(nside, p)), \
                (nside, c)

    # Face 4 (equatorial, jpll=0) base pixel at nside=1 sits at the
    # equator, phi = 0 quadrant; faces 0-3 in the north, 8-11 south.
    th, _ = pix2ang_ring(1, nest2ring(1, np.arange(12)))
    z = np.cos(th)
    assert np.all(z[:4] > 0.5) and np.all(np.abs(z[4:8]) < 1e-12) \
        and np.all(z[8:] < -0.5)

    # reorder round trip: values land where nest2ring says.
    nside = 4
    nest_map = np.arange(npix(nside), dtype=float)
    ring_map = reorder_nest_to_ring(nest_map)
    assert np.array_equal(ring_map[nest2ring(nside, np.arange(
        npix(nside)))], nest_map)

    with pytest.raises(ValueError):
        nest2ring(3, 0)          # not a power of two


def test_from_healpix_nested_matches_ring():
    """PixelSphereMask.from_healpix(order='NESTED') equals the RING
    ingestion of the same mask."""
    from chomp_tpu.curved import PixelSphereMask
    from chomp_tpu.healpix import nest2ring, npix, pix2ang_ring

    nside = 8
    p_ring = np.arange(npix(nside))
    th, ph = pix2ang_ring(nside, p_ring)
    ring_map = (np.cos(th) > 0.4).astype(float)
    nest_map = ring_map[nest2ring(nside, np.arange(npix(nside)))]
    m1 = PixelSphereMask.from_healpix(ring_map, n_ring=64)
    m2 = PixelSphereMask.from_healpix(nest_map, n_ring=64,
                                      order="NESTED")
    assert m1.area2 == m2.area2
    tq = np.linspace(0.01, 3.0, 50)
    np.testing.assert_allclose(m1.pair_function(tq),
                               m2.pair_function(tq), rtol=0, atol=0)
