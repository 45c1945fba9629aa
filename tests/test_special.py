"""Special functions vs scipy over wide ranges (float64)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sp

from chomp_tpu import special


def test_si_ci_wide_range():
    x = np.concatenate([
        np.logspace(-6, 0.6, 300),          # series region
        np.linspace(4.0, 64.0, 500),        # chebyshev regions
        np.logspace(1.81, 6, 300),          # asymptotic region
    ])
    si, ci = special.si_ci(jnp.asarray(x))
    si_ref, ci_ref = sp.sici(x)
    np.testing.assert_allclose(si, si_ref, rtol=0, atol=5e-14)
    np.testing.assert_allclose(ci, ci_ref, rtol=1e-12, atol=5e-14)


def test_si_ci_region_boundaries():
    """No discontinuity artifacts at the piecewise seams: both sides of
    every seam match scipy to machine precision."""
    for edge in (4.0, 16.0, 64.0):
        x = np.array([edge * (1 - 1e-9), edge, edge * (1 + 1e-9)])
        si, ci = special.si_ci(jnp.asarray(x))
        si_ref, ci_ref = sp.sici(x)
        np.testing.assert_allclose(si, si_ref, rtol=0, atol=1e-14)
        np.testing.assert_allclose(ci, ci_ref, rtol=0, atol=1e-14)


def test_bessel_j0_j1_j2():
    x = np.concatenate([
        np.linspace(1e-8, 8.0, 500),
        np.linspace(8.0, 100.0, 500),
        np.logspace(2, 5, 300),
    ])
    np.testing.assert_allclose(special.j0(jnp.asarray(x)), sp.j0(x),
                               rtol=0, atol=2e-13)
    np.testing.assert_allclose(special.j1(jnp.asarray(x)), sp.j1(x),
                               rtol=0, atol=2e-13)
    np.testing.assert_allclose(special.j2(jnp.asarray(x)), sp.jn(2, x),
                               rtol=0, atol=2e-13)


def test_bessel_negative_and_zero():
    np.testing.assert_allclose(special.j0(jnp.asarray(0.0)), 1.0, rtol=1e-14)
    np.testing.assert_allclose(special.j1(jnp.asarray(0.0)), 0.0, atol=1e-16)
    np.testing.assert_allclose(special.j2(jnp.asarray(0.0)), 0.0, atol=1e-16)
    x = np.linspace(-20, -0.1, 50)
    np.testing.assert_allclose(special.j1(jnp.asarray(x)), sp.j1(x), atol=2e-13)
    np.testing.assert_allclose(special.j0(jnp.asarray(x)), sp.j0(x), atol=2e-13)


def test_jit_vmap_grad_safe():
    f = jax.jit(lambda x: special.si_ci(x)[0])
    np.testing.assert_allclose(f(jnp.asarray(2.0)), sp.sici(2.0)[0], rtol=1e-13)
    g = jax.grad(lambda x: special.si_ci(x)[0])(jnp.asarray(2.0))
    # d Si/dx = sin(x)/x.
    np.testing.assert_allclose(g, np.sin(2.0) / 2.0, rtol=1e-10)
    gj = jax.grad(lambda x: special.j0(x))(jnp.asarray(3.0))
    np.testing.assert_allclose(gj, -sp.j1(3.0), rtol=1e-9)


def test_float32_accuracy_budget():
    """TPU float32 path: Si/Ci good to ~1e-6 abs, J0 to ~2e-6."""
    x64 = np.logspace(-3, 4, 2000)
    x32 = jnp.asarray(x64, dtype=jnp.float32)
    si, ci = special.si_ci(x32)
    si_ref, _ = sp.sici(x64)
    assert np.max(np.abs(np.asarray(si, dtype=np.float64) - si_ref)) < 5e-6
    jj = special.j0(jnp.asarray(x64[x64 < 50], dtype=jnp.float32))
    assert np.max(np.abs(np.asarray(jj, np.float64) - sp.j0(x64[x64 < 50]))) < 5e-6
