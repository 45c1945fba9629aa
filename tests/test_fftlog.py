"""FFTLog Hankel operator: analytic pairs, orthogonality with direct quad."""

import numpy as np

from chomp_tpu.fftlog import hankel_direct, hankel_operator


N, LNX0 = 1024, np.log(1e-4)
DLN = np.log(1e4 / 1e-4) / (N - 1)
X = np.exp(LNX0 + DLN * np.arange(N))


def test_gaussian_pair_j0():
    """∫ x^2 e^{-x^2/2} J0(xy) dx/x = e^{-y^2/2} (exact pair; untapered —
    the pair decays on its own, and the taper would clip real signal)."""
    y, h = hankel_operator(N, LNX0, DLN, 0.0, q=1.0)
    g = h @ (X**2 * np.exp(-(X**2) / 2))
    ref = np.exp(-(y**2) / 2)
    sel = (y > 1e-2) & (y < 30.0)
    np.testing.assert_allclose(g[sel], ref[sel], atol=1e-3)
    # Central region (the w(theta) use case) is much tighter.
    sel = (y > 0.1) & (y < 10.0)
    np.testing.assert_allclose(g[sel], ref[sel], atol=1e-7)


def test_gaussian_pair_j2():
    """∫ x^4 e^{-x^2/2} J2(xy) dx/x = y^2 e^{-y^2/2} (exact pair)."""
    y, h = hankel_operator(N, LNX0, DLN, 2.0, q=1.0)
    g = h @ (X**4 * np.exp(-(X**2) / 2))
    ref = y**2 * np.exp(-(y**2) / 2)
    sel = (y > 1e-3) & (y < 30.0)
    np.testing.assert_allclose(g[sel], ref[sel], atol=1e-8)


def test_against_direct_simpson_powerlaw_cutoff():
    """A C_l-like shape (power-law tilts + exponential cutoff) against a
    2^18-point direct Simpson Hankel transform."""
    def a_fn(x):
        return x**2 / (1.0 + (x / 5.0) ** 2.8) * np.exp(-((x / 2e3) ** 2))

    y, h = hankel_operator(N, LNX0, DLN, 0.0, q=1.0,
                           taper_lo=0.08, taper_hi=0.08)
    g = h @ a_fn(X)
    sel = (y > 3e-3) & (y < 3.0)
    ref = hankel_direct(a_fn, y[sel], x_lo=1e-6, x_hi=1e5, mu=0.0)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(g[sel], ref, atol=2e-5 * scale)


def test_lowring_and_nan_safety():
    """q=2 hits a Gamma pole in the n=0 Mellin factor — must give 0, not
    nan; operator stays finite."""
    y, h = hankel_operator(N, LNX0, DLN, 0.0, q=2.0)
    assert np.all(np.isfinite(h))


def test_operator_cached():
    y1, h1 = hankel_operator(N, LNX0, DLN, 0.0, q=1.0)
    y2, h2 = hankel_operator(N, LNX0, DLN, 0.0, q=1.0)
    assert h1 is h2


def test_fused_halo_contraction_kernel_interpret():
    """Pallas fused y+contraction kernel == XLA reference (interpret
    mode; the TPU run was verified at 3.5e-7 rel-to-peak and benchmarks
    within +-6% of XLA — the op is VPU-compute-bound, see module doc)."""
    import jax
    import jax.numpy as jnp

    from chomp_tpu.ops.halo_pallas import (
        fused_contractions,
        reference_contractions,
    )

    rng = np.random.default_rng(1)
    nk, nm = 300, 200
    k = jnp.asarray(np.logspace(-4, 6, nk), dtype=jnp.float32)
    rs = jnp.asarray(10 ** rng.uniform(-3, 0.5, nm), dtype=jnp.float32)
    c = jnp.asarray(10 ** rng.uniform(0.2, 1.6, nm), dtype=jnp.float32)
    wa = jnp.asarray(rng.normal(size=(nm, 8)), dtype=jnp.float32)
    wb = jnp.asarray(rng.normal(size=(nm, 8)), dtype=jnp.float32)
    out = fused_contractions(k, rs, c, wa, wb, interpret=True)
    ref = reference_contractions(k, rs, c, wa, wb)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 2e-6
