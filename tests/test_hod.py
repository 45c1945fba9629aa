"""HOD models: Zheng05 closed forms, moment relations, variants."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from chomp_tpu.hod import (
    HODKravtsov,
    HODMandelbaum,
    HODPoisson,
    default_hod,
)


def test_zheng_central_matches_closed_form():
    h = default_hod()
    m = np.logspace(10, 16, 200)
    ours = np.asarray(h.central_moment(jnp.asarray(m)))
    ref = 0.5 * (1.0 + erf((np.log10(m) - 12.14) / 0.15))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)


def test_zheng_satellite_cutoff_and_powerlaw():
    h = default_hod()
    m0 = 10.0**12.14
    # Below M_0: exactly zero satellites.
    assert float(h.satellite_moment(jnp.asarray(m0 * 0.99))) == 0.0
    # Well above: N_sat ~ (M - M_0)/M_1' with alpha = 1, N_cen = 1.
    m = 1e15
    expected = (m - m0) / 10.0**13.43
    np.testing.assert_allclose(h.satellite_moment(jnp.asarray(m)), expected,
                               rtol=1e-10)


def test_moment_relations():
    h = default_hod()
    m = jnp.asarray(np.logspace(11, 16, 50))
    nc = h.central_moment(m)
    ns = h.satellite_moment(m)
    np.testing.assert_allclose(h.first_moment(m), nc + ns, rtol=1e-14)
    np.testing.assert_allclose(h.second_moment(m), 2 * nc * ns + ns**2,
                               rtol=1e-14)
    np.testing.assert_allclose(h.nth_moment(m, 2), h.second_moment(m),
                               rtol=1e-14)
    np.testing.assert_allclose(h.nth_moment(m, 1), h.first_moment(m),
                               rtol=1e-14)
    # n = 3 factorial moment for Bernoulli-central + Poisson satellites.
    np.testing.assert_allclose(h.nth_moment(m, 3), 3 * nc * ns**2 + ns**3,
                               rtol=1e-14)


def test_poisson_hod():
    h = HODPoisson(log10_m_min=jnp.asarray(12.0), alpha=jnp.asarray(1.0))
    m = jnp.asarray([1e11, 1e13])
    n = h.first_moment(m)
    np.testing.assert_allclose(n, [0.0, 10.0 ** (13 - 12)], rtol=1e-12)
    np.testing.assert_allclose(h.second_moment(m), n * n, rtol=1e-12)


def test_mandelbaum_continuity():
    h = HODMandelbaum(m0=jnp.asarray(1e12), w=jnp.asarray(1.5))
    m_break = 3e12
    lo = h.satellite_moment(jnp.asarray(m_break * (1 - 1e-9)))
    hi = h.satellite_moment(jnp.asarray(m_break * (1 + 1e-9)))
    np.testing.assert_allclose(lo, hi, rtol=1e-6)


def test_kravtsov():
    h = HODKravtsov(log10_m_min=jnp.asarray(11.5), log10_m_1=jnp.asarray(12.5),
                    alpha=jnp.asarray(1.0))
    np.testing.assert_allclose(h.first_moment(jnp.asarray(10.0**12.5)),
                               1.0 + 1.0, rtol=1e-12)
    assert float(h.first_moment(jnp.asarray(1e11))) == 0.0


def test_hod_vmappable():
    """HOD params are a vmap axis (population inference batches)."""
    batch = default_hod()
    import dataclasses

    alphas = jnp.asarray([0.8, 1.0, 1.2])
    hb = dataclasses.replace(
        batch,
        alpha=alphas,
        **{f.name: jnp.broadcast_to(getattr(batch, f.name), alphas.shape)
           for f in dataclasses.fields(batch) if f.name != "alpha"},
    )
    out = jax.vmap(lambda h: h.first_moment(jnp.asarray(1e14)))(hb)
    assert out.shape == (3,)
    # (M - M_0)/M_1' > 1 at 1e14, so larger alpha -> more satellites.
    assert float(out[0]) < float(out[2])
