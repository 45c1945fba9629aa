"""Joint multi-probe inference: 3x2pt + cluster counts + RSD + BAO.

The capstone composition demo: FOUR probe families — photometric
w(theta)+gamma_t with their joint Gaussian covariance, Poisson cluster
number counts, spectroscopic P_0/P_2/P_4 multipoles with the FKP
covariance, and BAO distance ratios — all as traced functions of ONE
flat parameter vector p = (Omega_m, sigma_8, m_nu, sigma_v), summed by
inference.CompositeLikelihood, with the combined Fisher matrix from
one forward-mode pass.  Every block shares the same CosmoParams leaves
(the massive-neutrino and baryon-feedback knobs would ride along the
same way).

Independence caveat (documented, matches the module docstrings): the
composite treats blocks as independent — cross-probe SSC between the
3x2pt and counts blocks exists (clusters.joint_counts_3x2pt_covariance
builds the coupled matrix when that matters).

Run: python examples/multiprobe_example.py   (CPU f64, small grids;
~2-4 min cold)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import bao, clusters, covariance, halo, inference, projection, rsd
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec, default_cosmo, default_halo
from chomp_tpu.parallel import make_pipeline
from chomp_tpu.utils.tree import replace

C0 = default_cosmo()
HP = default_halo()
GRID = GridSpec(n_k=64, n_k_table=512, sigma_panels=6, sigma_n_per_panel=24,
                n_growth=24, n_dist=24, n_mass=96, n_z_proj=24, n_z_lens=24,
                n_ell=128, n_theta=8, n_z_dndz=48, n_mu=8, lattice_dln=0.032)
DIST_L = projection.DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
                                 z0=jnp.asarray(0.5), sigma_z=jnp.asarray(0.1))
OMEGA_S = 0.5          # sr, ~1640 deg^2
THETA_EDGES = np.logspace(np.log10(0.05), np.log10(2.0), 9)  # deg

# Spectro sample
K_EDGES = jnp.linspace(0.02, 0.25, 16)
K_MID = 0.5 * (K_EDGES[1:] + K_EDGES[:-1])
VOL = 1.0e9
SV_FID = 4.0
Z_RSD = 0.5

# BAO points (diagonal 1% errors, a DESI-like toy)
Z_BAO = jnp.asarray([0.51, 0.85, 1.48])

# Clusters
CSEL = clusters.ClusterSelection(
    ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 4.5e14, 2e16])),
    sigma_lnm=jnp.asarray(0.25))
Z_CL = (0.2, 0.4, 0.6)


def cosmo_of(p):
    return replace(C0, omega_m0=p[0], omega_l0=1.0 - p[0], sigma_8=p[1],
                   m_nu=p[2])


def main():
    p0 = jnp.asarray([float(C0.omega_m0), float(C0.sigma_8), 0.06, SV_FID])
    names = ("Omega_m", "sigma_8", "m_nu", "sigma_v")

    # --- 3x2pt block (w + gamma_t, joint Gaussian covariance) ---------
    pipe = make_pipeline(HP, default_hod(), DIST_L, grid=GRID, z_pivot=0.5)

    def theory_3x2(p):
        out = pipe(cosmo_of(p))
        return jnp.concatenate([out["w_theta"], out["gamma_t"]])

    model0 = halo.build_halo_model(cosmo_of(p0), HP, default_hod(), 0.5,
                                   grid=GRID)
    cov_3x2 = covariance.joint_wtheta_gammat_covariance(
        cosmo_of(p0), HP, model0, DIST_L, DIST_L, THETA_EDGES, OMEGA_S,
        n2d_lens=3.0e8, shape_noise=0.26**2 / 2.0e8, grid=GRID,
        include_nongaussian=False)
    print(f"3x2pt block: {2 * (len(THETA_EDGES) - 1)} bins, "
          f"cond(cov) = {np.linalg.cond(np.asarray(cov_3x2)):.1e}")
    d_3x2 = theory_3x2(p0)
    like_3x2 = inference.GaussianLikelihood(theory_3x2, d_3x2,
                                            np.asarray(cov_3x2))

    # --- cluster-counts block (Poisson) --------------------------------
    def theory_counts(p):
        return clusters.cluster_counts(cosmo_of(p), HP, CSEL, Z_CL,
                                       OMEGA_S, grid=GRID).ravel()

    n0 = theory_counts(p0)
    print(f"counts block: {n0.size} cells, N = "
          + np.array2string(np.asarray(n0), precision=1))
    like_n = inference.PoissonLikelihood(theory_counts, jnp.round(n0))

    # --- RSD block ------------------------------------------------------
    def theory_rsd(p):
        c = cosmo_of(p)
        m = halo.build_halo_model(c, HP, default_hod(), Z_RSD, grid=GRID)
        return rsd.multipoles(c, HP, m, K_MID, sigma_v=p[3],
                              grid=GRID).ravel()

    cov_rsd = rsd.multipole_covariance(cosmo_of(p0), HP,
                                       halo.build_halo_model(
                                           cosmo_of(p0), HP, default_hod(),
                                           Z_RSD, grid=GRID),
                                       K_EDGES, VOL, sigma_v=SV_FID,
                                       grid=GRID)
    like_rsd = inference.GaussianLikelihood(theory_rsd, theory_rsd(p0),
                                            np.asarray(cov_rsd))
    print(f"RSD block: {3 * K_MID.shape[0]} entries")

    # --- BAO block ------------------------------------------------------
    def theory_bao(p):
        return bao.bao_vector(cosmo_of(p), Z_BAO).ravel()

    d_bao = theory_bao(p0)
    cov_bao = np.diag((0.01 * np.asarray(d_bao)) ** 2)
    like_bao = inference.GaussianLikelihood(theory_bao, d_bao, cov_bao)
    print(f"BAO block: {d_bao.size} entries")

    # --- compose + Fisher ------------------------------------------------
    blocks = {"3x2pt": like_3x2, "counts": like_n, "RSD": like_rsd,
              "BAO": like_bao}
    print("\nper-probe and combined forecast (sigma, marginalized):")
    total = inference.CompositeLikelihood(list(blocks.values()))
    fis = {k: np.asarray(lk.fisher(p0)) for k, lk in blocks.items()}
    fis["COMBINED"] = sum(fis.values())
    hdr = "  ".join(f"{n:>8s}" for n in names)
    print(f"  {'probe':10s} {hdr}")
    for k, F in fis.items():
        # Regularize unconstrained directions (e.g. BAO knows nothing
        # of sigma_v) with a broad prior for the report.
        Fr = F + np.diag([1e-8, 1e-8, 1e-6, 1e-4])
        sig = np.sqrt(np.diag(np.linalg.inv(Fr)))
        row = "  ".join(f"{s:8.4f}" for s in sig)
        print(f"  {k:10s} {row}")
    # Posterior check: the composite -2 ln L at the truth is ~ 0 (data
    # generated at p0, no scatter injected).
    chi2 = float(total.neg_log_post(p0))
    print(f"\ncomposite -ln post at truth: {chi2:.3f} (prior-free, "
          "data==model so ~ Poisson rounding only)")
    assert np.isfinite(chi2)
    print("OK")


if __name__ == "__main__":
    main()
