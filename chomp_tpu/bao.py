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

__all__ = ["r_drag", "bao_vector"]

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
