"""chomp-form K(k*theta) kernel: limits, oracle, route equivalence."""

import jax.numpy as jnp
import numpy as np

from chomp_tpu import correlation, kernelfn, projection
from tests.oracle import oracle


def gauss_dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def test_kernel_low_ktheta_limit(fiducial):
    """K(k theta -> 0) = ∫ W_a W_b D^2 dchi (J0 -> 1)."""
    win = projection.WindowGalaxy(dist=gauss_dist())
    kt = kernelfn.build_kernel(fiducial, win, win)
    # y=1e-7: J0 rolloff is ~(y chi)^2/4 ~ 1e-8 — effectively K(0).
    k0 = kernelfn.kernel_at(kt, jnp.asarray(np.log(1e-7)))

    from scipy.integrate import quad
    chi_s, d_s = oracle._chi_growth_splines()

    def integrand(z):
        wg = oracle.window_galaxy_z(z)
        return wg * wg * d_s(z) ** 2 * oracle.CH / oracle.ez(z)

    ref, _ = quad(integrand, 1e-4, 2.0, epsrel=1e-10, limit=200)
    np.testing.assert_allclose(k0, ref, rtol=5e-5)


def test_kernel_vs_oracle_quadrature(fiducial):
    """K at several k*theta vs Bessel-zero-chunked direct quadrature."""
    from scipy.integrate import quad
    from scipy.special import j0, jn_zeros

    win = projection.WindowGalaxy(dist=gauss_dist())
    kt = kernelfn.build_kernel(fiducial, win, win)
    chi_s, d_s = oracle._chi_growth_splines()

    def k_direct(ktheta):
        def integrand(z):
            wg = oracle.window_galaxy_z(z)
            chi = chi_s(z)
            return (wg * wg * d_s(z) ** 2 * j0(ktheta * chi)
                    * oracle.CH / oracle.ez(z))

        # chunk in z at the Bessel zeros of J0(ktheta * chi(z))
        zeros = jn_zeros(0, min(int(ktheta * 4000 / np.pi) + 2, 20000)) / ktheta
        z_edges = [1e-4]
        for c in zeros:
            if c < chi_s(1e-4) or c > chi_s(2.0):
                continue
            z_edges.append(float(np.interp(c, chi_s(np.linspace(1e-4, 2, 2000)),
                                           np.linspace(1e-4, 2, 2000))))
        z_edges.append(2.0)
        z_edges = np.unique(z_edges)
        total = 0.0
        for lo, hi in zip(z_edges[:-1], z_edges[1:]):
            v, _ = quad(integrand, lo, hi, epsrel=1e-10, limit=200)
            total += v
        return total

    for ktheta in (1e-4, 1e-3, 1e-2):
        ours = float(kernelfn.kernel_at(kt, jnp.asarray(np.log(ktheta))))
        ref = k_direct(ktheta)
        # K at 1e-3/1e-2 is oscillation-suppressed 20-1000x below K(0):
        # bound the error relative to the unsuppressed scale K(0)~3.1e-4.
        assert abs(ours - ref) < 2e-4 * 3.1e-4, f"ktheta={ktheta}"
        np.testing.assert_allclose(ours, ref, rtol=5e-3,
                                   err_msg=f"ktheta={ktheta}")


def test_chomp_route_equals_cl_route(fiducial):
    """w(theta) via chomp's K(k theta) formulation == the C_ell + FFTLog
    fast path at the SAME Limber convention (chomp's kernel substitutes
    k = ell/chi, i.e. ell_offset = 0; the default 0.5-offset fast path
    differs from it by the known few-x-1e-3 Limber-correction term)."""
    win = projection.WindowGalaxy(dist=gauss_dist())
    pt = projection.power_table_linear(fiducial)
    kt = kernelfn.build_kernel(fiducial, win, win)
    thetas = jnp.asarray([0.05, 0.1, 0.5, 1.0])
    w_chomp = kernelfn.wtheta_chomp_form(fiducial, kt, pt, thetas)
    ells, _, _ = correlation.ell_grid()
    cl0 = projection.limber_cl(fiducial, win, win, jnp.asarray(ells), pt,
                               ell_offset=0.0)
    w_cl0 = correlation.wtheta_from_cl(cl0, thetas)
    np.testing.assert_allclose(np.asarray(w_chomp), np.asarray(w_cl0),
                               rtol=2e-4)


def test_kernel_quad_matches_fftlog(fiducial):
    """force_quad referee (dense Simpson) == FFTLog spline, J0 and J2."""
    win = projection.WindowGalaxy(dist=gauss_dist())
    ln_kt = jnp.log(jnp.asarray([1e-5, 1e-4, 1e-3, 1e-2, 0.1]))
    for mu in (0.0, 2.0):
        kt = kernelfn.build_kernel(fiducial, win, win, mu=mu)
        fast = np.asarray(kernelfn.kernel_at(kt, ln_kt))
        quad = np.asarray(kernelfn.kernel_quad(fiducial, win, win, ln_kt,
                                               mu=mu))
        # K oscillates through zero at high k*theta: compare against the
        # unsuppressed K(0) scale (~3e-4), not pointwise relative.
        scale = max(np.abs(fast).max(), 1e-30)
        np.testing.assert_allclose(quad, fast, atol=2e-4 * scale,
                                   err_msg=f"mu={mu}")


def test_z_bar_exposed(fiducial):
    win = projection.WindowGalaxy(dist=gauss_dist())
    kt = kernelfn.build_kernel(fiducial, win, win)
    assert 0.9 < float(kt.z_bar) < 1.05
