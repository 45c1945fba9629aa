"""BAO distance observables: D_M/r_d, D_H/r_d, D_V/r_d.

Capability extension beyond chomp (upstream:cosmology.py computes
distances but no likelihood-ready BAO vector): the compressed
observables every BAO analysis publishes, as one traced function of
CosmoParams — drop the output into inference.GaussianLikelihood with a
survey's measured vector + covariance and sample.

Definitions (all distances in Mpc/h internally; the r_d ratio is
dimensionless so the h's cancel against r_d in Mpc/h):

    D_M(z) = f_K(chi(z))                 comoving transverse distance
    D_H(z) = c / H(z) = (c/H0) / E(z)    Hubble distance
    D_V(z) = [ z D_M(z)^2 D_H(z) ]^(1/3) volume-averaged distance

r_d = linear.sound_horizon_drag (EH98 eqs. 2-6) — the SAME sound
horizon that positions the BAO wiggles in this framework's
transfer_eh_full, so the template and the distance ladder are
self-consistent (the usual caveat: the EH98 fit is 1-2% from a
Boltzmann r_d in absolute terms; BAO fits constrain distance RATIOS,
where a common r_d rescaling is degenerate with the calibration).
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import background, linear
from chomp_tpu.params import C_OVER_H0, CosmoParams

__all__ = ["r_drag", "bao_vector", "damped_power_template"]

_KINDS = ("dm_over_rd", "dh_over_rd", "dv_over_rd")


def r_drag(cosmo: CosmoParams):
    """Sound horizon at the drag epoch in Mpc/h (EH98 fit; see
    linear.sound_horizon_drag for the Mpc form and accuracy notes)."""
    return linear.sound_horizon_drag(cosmo) * cosmo.h


def bao_vector(cosmo: CosmoParams, z, kinds=_KINDS, n: int = 64):
    """Stacked BAO observables at redshifts ``z``: (len(kinds), n_z).

    ``kinds`` from {"dm_over_rd", "dh_over_rd", "dv_over_rd"}.  Fully
    traced (vmap/grad/Fisher/HMC over any CosmoParams leaf, including
    w0/wa/curvature — D_M uses the series-safe open/closed f_K)."""
    z = jnp.atleast_1d(jnp.asarray(z))
    rd = r_drag(cosmo)
    dm = background.transverse_comoving_distance(cosmo, z, n)
    dh = C_OVER_H0 / background.ez(cosmo, z)
    rows = []
    for kind in kinds:
        if kind == "dm_over_rd":
            rows.append(dm / rd)
        elif kind == "dh_over_rd":
            rows.append(dh / rd)
        elif kind == "dv_over_rd":
            rows.append((z * dm * dm * dh) ** (1.0 / 3.0) / rd)
        else:
            raise ValueError(f"unknown BAO kind {kind!r}; pick from "
                             f"{_KINDS}")
    return jnp.stack(rows)


def damped_power_template(cosmo: CosmoParams, k, mu=None, z=0.0,
                          sigma_par=10.0, sigma_perp=6.0, grid=None):
    """The standard compressed-BAO-fit power template: the linear
    wiggle spectrum with its oscillations Gaussian-damped by nonlinear
    bulk flows (Eisenstein, Seo & White 2007; the BOSS/DESI fitting
    form):

        P_t(k, mu) = P_nw(k) + [P_lin(k) - P_nw(k)]
                               * exp(-k^2 Sigma^2(mu) / 2),
        Sigma^2(mu) = mu^2 sigma_par^2 + (1 - mu^2) sigma_perp^2,

    with P_nw this framework's own EH98 no-wiggle shape and P_lin the
    full wiggle form — the SAME transfer pair the halo model uses, so
    template and full-shape analyses share one r_d (linear.
    sound_horizon_drag positions the wiggles).  ``mu=None`` returns
    the isotropic template (Sigma^2 = (sigma_par^2 + 2 sigma_perp^2)/3,
    the angle-average); otherwise (n_k, n_mu).  sigma_par/perp are
    TRACED (fit or marginalize them; reconstruction shrinks both).
    Pair with rsd.ap_parameters for the alpha scalings, or evaluate at
    warped k as in rsd.multipoles_ap."""
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    k = jnp.atleast_1d(jnp.asarray(k))
    p_w = linear.linear_power(cosmo, k, z, True, grid)
    p_nw = linear.linear_power(cosmo, k, z, False, grid)
    sp2 = jnp.asarray(sigma_par) ** 2
    st2 = jnp.asarray(sigma_perp) ** 2
    if mu is None:
        s2 = (sp2 + 2.0 * st2) / 3.0
        damp = jnp.exp(-0.5 * k * k * s2)
        return p_nw + (p_w - p_nw) * damp
    mu = jnp.atleast_1d(jnp.asarray(mu))
    s2 = mu * mu * sp2 + (1.0 - mu * mu) * st2          # (n_mu,)
    damp = jnp.exp(-0.5 * (k * k)[:, None] * s2[None, :])
    return p_nw[:, None] + (p_w - p_nw)[:, None] * damp
