"""Tomographic 3x2pt in chomp_tpu: a DES-style multi-bin data vector,
its full Gaussian covariance, and a Fisher forecast.

Capability extension beyond chomp (upstream: single lens/source sample
per Correlation/Covariance object; SURVEY.md §2 rows 12-13): here 2
lens bins x 2 source bins -> 12 probes (w_0, w_1, gt_{ij}, xi_+^{jk},
xi_-^{jk}) assembled from ONE halo-model evaluation per cosmology on
the gather-free lattice, with PER-BIN HODs (cross-bin clustering via
halo.power_gg_cross), per-bin shot/shape noise, and the exact
xi_+ x xi_- shot-noise cancellation across every bin pair.

Run: python examples/tomographic_example.py        (CPU f64 by design:
covariance eigenvalues are float32-sensitive; the prediction pipeline
itself is the TPU fast path — see tests/test_tomographic.py and
benchmarks/bench_components.py.)
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import covariance, default_cosmo, default_halo, halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import make_tomographic_pipeline

# Survey: ~1000 deg^2, two lens bins, two source bins.
OMEGA_S = 0.3                       # sr
N2D_LENS = [3.0e7, 2.0e7]           # lenses / sr per bin
SIGMA_EPS = 0.26                    # per component
N2D_SRC = [4.0e7, 3.0e7]            # sources / sr per bin
SHAPE_NOISE = [SIGMA_EPS**2 / n for n in N2D_SRC]

cosmo = default_cosmo()
h = default_halo()
# Per-lens-bin HODs: the higher-z bin selects brighter galaxies.
hods = [default_hod(),
        default_hod(log10_m_min=12.5, log10_m_0=12.5, log10_m_1p=13.8)]


def dist_at(z0, sz, z_max=2.5):
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(z_max),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))


lens = [dist_at(0.4, 0.12), dist_at(0.7, 0.12)]
src = [dist_at(0.8, 0.20), dist_at(1.2, 0.25)]

edges_deg = np.logspace(np.log10(0.05), np.log10(2.0), 9)   # 8 bins
theta_mid = np.sqrt(edges_deg[:-1] * edges_deg[1:])
nb = len(theta_mid)

# Moderate grid keeps this example <1 min on the 1-core CPU box; drop
# the GridSpec override for production accuracy.
grid = GridSpec(n_mass=128, n_mu=8, sigma_panels=8, sigma_n_per_panel=32,
                n_growth=32, n_dist=32)

# --- tomographic data vector: ONE mass-table build, 12 probes --------
pipe = make_tomographic_pipeline(h, hods, lens, src, theta_deg=theta_mid,
                                 z_pivot=0.6, grid=grid)
out = pipe(cosmo)
vec = np.asarray(out["vector"])
probes = covariance.tomographic_probes(len(lens), len(src))
print(f"tomographic 3x2pt vector: {vec.shape[0]} entries "
      f"({len(probes)} probes x {nb} bins); per-bin n_g =",
      np.asarray(out["n_g"]))
print("probe order:", [p[0] for p in probes])

# --- full tomographic Gaussian covariance (per-bin halo models) ------
models = halo.build_halo_models(cosmo, h, hods, 0.6, False, grid)
cov = np.asarray(covariance.tomographic_3x2pt_covariance(
    cosmo, h, models, lens, src, edges_deg, OMEGA_S, N2D_LENS,
    SHAPE_NOISE, grid=grid))
assert cov.shape == (len(probes) * nb,) * 2
eig = np.linalg.eigvalsh(0.5 * (cov + cov.T))
assert eig[0] > -1e-12 * eig[-1]
sn = {p[0]: float(np.sqrt(
    vec[i * nb:(i + 1) * nb] @ np.linalg.solve(
        cov[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb],
        vec[i * nb:(i + 1) * nb])))
    for i, p in enumerate(probes)}
print("per-probe S/N:", {k: round(v, 1) for k, v in sn.items()})

# --- Fisher forecast via autodiff through the whole pipeline ---------
def vec_of_params(p):
    om, s8 = p
    c = dataclasses.replace(cosmo, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    return pipe(c)["vector"]


jac = np.asarray(jax.jacfwd(vec_of_params)(
    jnp.array([cosmo.omega_m0, cosmo.sigma_8])))
fisher = jac.T @ np.linalg.solve(cov, jac)
err = np.sqrt(np.diag(np.linalg.inv(fisher)))
rho = np.linalg.inv(fisher)[0, 1] / (err[0] * err[1])
print(f"Fisher (Omega_m, sigma_8): sigma = {err[0]:.4f}, {err[1]:.4f}, "
      f"corr = {rho:+.2f}")
assert np.all(np.isfinite(fisher)) and np.all(err > 0)

# --- systematics-marginalized Fisher: the traced nuisance layer ------
# One jitted jacfwd through (cosmology + source photo-z shifts + a
# common shear m + IA): marginalizing the standard systematics
# inflates the cosmology errors.
from chomp_tpu.parallel.sweep import default_nuisance

pipe_nu = make_tomographic_pipeline(h, hods, lens, src,
                                    theta_deg=theta_mid, z_pivot=0.6,
                                    grid=grid, with_nuisance=True)
nu0 = default_nuisance(len(lens), len(src))


def vec_full(p):
    om, s8, dzs0, dzs1, m_all, a_ia = p
    c = dataclasses.replace(cosmo, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    nu = dataclasses.replace(
        nu0, dz_src=jnp.stack([dzs0, dzs1]),
        m=jnp.stack([m_all, m_all]), a_ia=a_ia)
    return pipe_nu(c, nu)["vector"]


p0 = jnp.array([cosmo.omega_m0, cosmo.sigma_8, 0, 0, 0, 0.0])
jac6 = np.asarray(jax.jit(jax.jacfwd(vec_full))(p0))
# Gaussian priors: dz ~ 0.01, m ~ 0.01, A_ia ~ 1 (survey-typical).
prior = np.diag(1.0 / np.array([np.inf, np.inf, .01, .01, .01,
                                1.0]) ** 2)
f6 = jac6.T @ np.linalg.solve(cov, jac6) + prior
err6 = np.sqrt(np.diag(np.linalg.inv(f6)))[:2]
print(f"marginalized over 4 systematics: sigma(Omega_m) = {err6[0]:.4f} "
      f"(x{err6[0] / err[0]:.2f}), sigma(sigma_8) = {err6[1]:.4f} "
      f"(x{err6[1] / err[1]:.2f})")
assert np.all(err6 >= err * 0.999)

# --- analysis hygiene: scale cuts + point-mass marginalization -------
# Drop gt below 0.1 deg (unmodelled small-scale mass), then marginalize
# the residual enclosed-mass 1/theta^2 term analytically (improper
# prior) per lens x source pair — the Fisher loses exactly the
# template-degenerate directions, nothing else.
from chomp_tpu import inference

keep = inference.theta_cut_mask(
    len(lens), len(src), theta_mid,
    {"gt": (0.1, np.inf), "w": (0.08, np.inf)})
tpl = inference.point_mass_templates(len(lens), len(src), theta_mid)
fn_cut, d_cut, cov_cut, tpl_cut = inference.apply_scale_cuts(
    keep, vec_of_params, vec, cov, templates=tpl)
like = inference.GaussianLikelihood(fn_cut, d_cut, cov_cut,
                                    templates=tpl_cut)
p2 = jnp.array([cosmo.omega_m0, cosmo.sigma_8])
err_pm = np.sqrt(np.diag(np.linalg.inv(np.asarray(like.fisher(p2)))))
print(f"cut ({int(keep.sum())}/{keep.size} pts) + point-mass-"
      f"marginalized: sigma(Omega_m) = {err_pm[0]:.4f}, "
      f"sigma(sigma_8) = {err_pm[1]:.4f}")
assert float(like.chi2(p2)) < 1e-6          # data == theory at fiducial
assert np.all(np.isfinite(err_pm)) and np.all(err_pm >= err * 0.999)
print("OK")
