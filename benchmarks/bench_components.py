"""Per-component benchmark harness (SURVEY.md §5.1: the tracing/
profiling subsystem the reference never had).

Prints a stage-by-stage timing table for the flagship pipeline plus the
BASELINE.json secondary metric (batched C_ell / P(k) evals per second
per chip).  Run on any backend; the driver's headline number comes from
bench.py instead.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(batch_size: int = 100, json_path: str | None = None):
    from chomp_tpu import correlation, default_cosmo, default_halo, halo
    from chomp_tpu import limber_fft, linear, projection
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import DEFAULT_GRID
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline

    b = batch_size
    oms = jnp.linspace(0.24, 0.32, b)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms, omega_l0=1.0 - oms)
    h = default_halo()
    hod = default_hod()
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    win = projection.WindowGalaxy(dist=dist)
    ells_np = correlation.ell_grid(DEFAULT_GRID)[0]

    print(f"device: {jax.devices()[0]}   batch: {b}")
    rows = []

    def stage(name, fn):
        f = jax.jit(jax.vmap(fn))
        dt = timed(f, batch)
        rows.append((name, dt / b * 1e3))

    stage("linear P(k) [1024 pts]",
          lambda c: linear.linear_power(
              c, jnp.asarray(np.logspace(-3, 2, 1024))))
    stage("mass tables + halo model",
          lambda c: halo.build_halo_model(c, h, hod).n_g)
    stage("halo P on Limber lattice",
          lambda c: limber_fft.p_lattice_halo(
              c, h, halo.build_halo_model(c, h, hod), "power_gg"))

    def cl_fn(c):
        model = halo.build_halo_model(c, h, hod)
        p = limber_fft.p_lattice_halo(c, h, model, "power_gg")
        return limber_fft.limber_cl_fft(c, win, win, ells_np, p,
                                        growth_pivot=model.mass.growth)

    stage("+ Limber C_ell [1024 ells]", cl_fn)
    win_k = projection.WindowConvergence(dist=dist)
    stage("window lattice G (galaxy x galaxy)",
          lambda c: limber_fft._lattice_g(c, win, win, DEFAULT_GRID))
    stage("window lattice G (kappa x galaxy)",
          lambda c: limber_fft._lattice_g(c, win_k, win, DEFAULT_GRID))
    full = make_pipeline(h, hod, dist)
    stage("full w+gamma_t pipeline", full)

    # Joint covariance (VERDICT round-3 item 1: "covariance ms/cosmology
    # recorded"): default production settings, vmapped over 16
    # cosmologies — Gaussian blocks C_ell's via the gather-free lattice,
    # trispectrum projection via static-weight einsums.
    from chomp_tpu import covariance as cov_mod

    d_src = projection.DNdzGaussian(
        z_min=jnp.asarray(0.3), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.3))
    edges = cov_mod.theta_bin_edges_deg(DEFAULT_GRID, n_bins=8)

    def cov_fn(c):
        model = halo.build_halo_model(c, h, hod)
        return cov_mod.joint_wtheta_gammat_covariance(
            c, h, model, dist, d_src, edges, 0.1, 3.0e7, 1.0e-9)

    b_cov = min(b, 16)
    batch_cov = jax.tree_util.tree_map(lambda x: x[:b_cov], batch)
    f_cov = jax.jit(jax.vmap(cov_fn))
    dt_cov = timed(f_cov, batch_cov, reps=2)
    rows.append((f"joint (w,gt) covariance [{b_cov}]", dt_cov / b_cov * 1e3))

    # Tomographic 3x2pt (2 lens x 2 source bins = 12 probes): the
    # full prediction vector and the 12-probe Gaussian covariance, one
    # shared halo evaluation each.
    from chomp_tpu.parallel.sweep import make_tomographic_pipeline

    d_lens2 = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.75), sigma_z=jnp.asarray(0.15))
    d_src2 = projection.DNdzGaussian(
        z_min=jnp.asarray(0.3), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.3), sigma_z=jnp.asarray(0.3))
    lens_bins, src_bins = [dist, d_lens2], [d_src, d_src2]
    tomo = make_tomographic_pipeline(h, hod, lens_bins, src_bins,
                                     z_pivot=0.6)
    stage("tomographic 2x2 vector (12 probes)", tomo)

    # Non-Limber low-ell repair + Kaiser RSD (nonlimber.py): the same
    # w+gamma_t pipeline with the exact spherical-Bessel correction
    # below ell=40 — measures the cost of the Mellin-kernel transfer
    # stages on top of the separable fast path.
    full_nl = make_pipeline(h, hod, dist, nonlimber_ell_switch=40,
                            nonlimber_rsd=True)
    stage("w+gt + non-Limber/RSD (ell<40)", full_nl)

    # 5x2pt + kappa_CMB: the tomographic vector with per-lens-bin
    # w_{g kappa_CMB} rows (cmblens.py) — one extra fused-conv row per
    # lens bin.
    tomo5 = make_tomographic_pipeline(h, hod, lens_bins, src_bins,
                                      z_pivot=0.6,
                                      include_cmb_lensing=True)
    stage("tomographic + kappa_CMB (14 probes)", tomo5)

    def tomo_cov_fn(c):
        model = halo.build_halo_model(c, h, hod, 0.6)
        return cov_mod.tomographic_3x2pt_covariance(
            c, h, model, lens_bins, src_bins, edges, 0.1,
            [3.0e7, 2.0e7], [1.0e-9, 1.4e-9])

    f_tcov = jax.jit(jax.vmap(tomo_cov_fn))
    dt_tcov = timed(f_tcov, batch_cov, reps=2)
    rows.append((f"tomographic 12-probe covariance [{b_cov}]",
                 dt_tcov / b_cov * 1e3))

    # Harmonic-space band powers (bandpowers.py): the MASTER-decoupled
    # tomographic bandpower vector + its Gaussian covariance on an
    # apodized spherical cap.  Mask couplings/decouplers are OFFLINE
    # numpy (built once here); the traced cost is one static
    # (n_band, n_tbl) matmul per probe / 8 kernel sandwiches per block.
    from chomp_tpu import bandpowers as bp_mod
    from chomp_tpu.curved import ProfileCurvedMask

    th_prof = np.linspace(0.0, 0.6, 61)
    bp_mask = ProfileCurvedMask(
        th_prof, np.clip((0.6 - th_prof) / 0.2, 0.0, 1.0), lmax_mask=256)
    bp_lmax, bp_edges = 512, [8, 32, 64, 128, 256, 384, 512]
    bp_fn = bp_mod.make_bandpower_pipeline(h, hod, lens_bins, src_bins,
                                           bp_mask, bp_lmax, bp_edges)
    stage("tomographic bandpower vector (12 probes)",
          lambda c: bp_fn(c)["vector"])

    def bp_cov_fn(c):
        model = halo.build_halo_model(c, h, hod)
        return bp_mod.tomographic_bandpower_covariance(
            c, h, model, lens_bins, src_bins, bp_mask, bp_lmax, bp_edges,
            [3.0e7, 2.0e7], [1.0e-9, 1.4e-9])

    f_bcov = jax.jit(jax.vmap(bp_cov_fn))
    dt_bcov = timed(f_bcov, batch_cov, reps=2)
    rows.append((f"12-probe bandpower covariance [{b_cov}]",
                 dt_bcov / b_cov * 1e3))

    # Data route (sht.py): masked maps -> pseudo-C_l -> decoupled band
    # powers for 2 galaxy + 2 shear fields per sky at lmax=256 — the
    # MXU-batched dense-table SHT (3 tables x 100 MB f32).
    from chomp_tpu.sht import SHT, gl_mask_map

    sh = SHT(256, n_lat=384, n_phi=1024, spin2=True)
    setup_s = bp_mod.bandpower_setup(bp_mask, 256,
                                     [8, 32, 64, 128, 192, 256])
    w_map = jnp.asarray(gl_mask_map(sh, bp_mask), jnp.float32)
    b_sky = 8
    rng = np.random.default_rng(0)
    s_maps = jnp.asarray(rng.normal(size=(2, b_sky, 384, 1024)),
                         jnp.float32)
    qu_maps = jnp.asarray(rng.normal(size=(2, 2, b_sky, 384, 1024)),
                          jnp.float32)
    # The SHT object is a pytree argument: its 300 MB of tables travel
    # as device buffers, NOT as program constants (the axon remote
    # compile rejects constant-embedded programs that large).
    f_maps = jax.jit(lambda s_obj, s, qu: bp_mod.map_bandpowers(
        s_obj, w_map, setup_s, scalar_maps=s, qu_maps=qu))
    f_maps(sh, s_maps, qu_maps)                   # compile
    t0 = time.perf_counter()
    reps_m = 3
    for _ in range(reps_m):
        jax.block_until_ready(f_maps(sh, s_maps, qu_maps))
    dt_m = (time.perf_counter() - t0) / reps_m
    rows.append((f"map->bandpowers, 4 fields/sky lmax=256 [{b_sky}]",
                 dt_m / b_sky * 1e3))

    # Super-sample block (responses x footprint sigma_b^2 on the
    # gather-free lattice): the w(theta) auto SSC on a 0.1 sr disc.
    from chomp_tpu import ssc as ssc_mod
    from chomp_tpu.mask import DiscMask

    ssc_mask = DiscMask(float(np.sqrt(0.1 / np.pi)))

    def ssc_fn(c):
        model = halo.build_halo_model(c, h, hod)
        return ssc_mod.ssc_covariance(c, h, model, dist, edges, ssc_mask)

    f_ssc = jax.jit(jax.vmap(ssc_fn))
    dt_ssc = timed(f_ssc, batch_cov, reps=2)
    rows.append((f"SSC w-auto block [{b_cov}]", dt_ssc / b_cov * 1e3))

    # Cluster counts (clusters.py): 3 z bins x 2 proxy bins over a
    # 5000 deg^2 footprint, plus the Poisson + Limber-SSC covariance.
    from chomp_tpu import clusters as cl_mod

    csel = cl_mod.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 4.5e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    cz = (0.2, 0.4, 0.6, 0.8)
    stage("cluster counts (3z x 2proxy)",
          lambda c: cl_mod.cluster_counts(c, h, csel, cz, 1.5))
    f_ccov = jax.jit(jax.vmap(
        lambda c: cl_mod.counts_covariance(c, h, csel, cz, 1.5)))
    dt_cc = timed(f_ccov, batch_cov, reps=2)
    rows.append((f"counts Poisson+SSC covariance [{b_cov}]",
                 dt_cc / b_cov * 1e3))

    # halofit (nlpower.py): the full 4-probe pipeline with the mm legs
    # on Takahashi 2012 instead of the halo model.
    full_hf = make_pipeline(h, hod, dist, include_shear=True,
                            matter_power="halofit")
    stage("w+gt+xi_pm pipeline (halofit mm)", full_hf)

    # Massive neutrinos (neutrino.py): the flagship pipeline with
    # m_nu traced and nonzero (EH99 suppression on every layer).
    from chomp_tpu.utils.tree import replace as _replace

    full_nu = make_pipeline(h, hod, dist)
    stage("w+gt pipeline (m_nu = 0.2 eV)",
          lambda c: full_nu(_replace(c, m_nu=jnp.asarray(0.2))))

    # Spectroscopic multipoles (rsd.py): P_0/P_2/P_4 on 64 k-points +
    # the FKP/Grieb covariance on 28 k-bins.
    from chomp_tpu import rsd as rsd_mod

    k_rsd = jnp.asarray(np.logspace(-2, 0.3, 64))
    rsd_edges = jnp.asarray(np.linspace(0.02, 0.3, 29))

    def rsd_obs(c):
        m = halo.build_halo_model(c, h, hod, 0.5)
        return (rsd_mod.multipoles(c, h, m, k_rsd, sigma_v=4.0),
                rsd_mod.multipole_covariance(c, h, m, rsd_edges, 1.0e9,
                                             sigma_v=4.0))

    stage("RSD P_ell + FKP covariance", rsd_obs)

    # Configuration-space multipoles xi_ell(s) (BAO scales) + the
    # Grieb-style Gaussian covariance (24 s-bins).
    s_xi = jnp.asarray(np.linspace(30.0, 140.0, 23))
    s_edges_xi = np.linspace(30.0, 150.0, 25)

    def xi_obs(c):
        m = halo.build_halo_model(c, h, hod, 0.5)
        return (rsd_mod.xi_multipoles(c, h, m, s_xi, sigma_v=4.0,
                                      with_bao=True),
                rsd_mod.xi_multipole_covariance(c, h, m, s_edges_xi,
                                                1.0e9, sigma_v=4.0))

    stage("xi_ell(s) + Gaussian covariance", xi_obs)

    # Projected correlation wp(rp) (HOD-fitting observable) + its
    # covariance pushforward.
    rp_wp = np.geomspace(0.3, 30.0, 14)

    def wp_obs(c):
        m = halo.build_halo_model(c, h, hod, 0.5)
        return (rsd_mod.wp_rp(c, h, m, rp_wp, sigma_v=4.0),
                rsd_mod.wp_covariance(c, h, m, rp_wp, 1.0e9,
                                      sigma_v=4.0))

    stage("wp(rp) + covariance", wp_obs)

    # Emulated serving path (emulator.py): train a small surrogate of
    # the flagship w+gt pipeline on an LHS sweep (exact evals ride the
    # vmapped fast path), then time batched emulator evaluations —
    # the production-MCMC cost after amortizing the sweep.
    from chomp_tpu import emulator as emu_mod
    from chomp_tpu.utils.tree import replace as _rep

    full_pipe = make_pipeline(h, hod, dist)

    def emu_theory(p):
        c = _rep(default_cosmo(), omega_m0=p[0], omega_l0=1.0 - p[0],
                 sigma_8=p[1])
        out = full_pipe(c)
        return jnp.concatenate([out["w_theta"], out["gamma_t"]])

    t0 = time.perf_counter()
    emu, rep = emu_mod.train_emulator(
        emu_theory, np.array([[0.24, 0.32], [0.7, 0.92]]),
        jax.random.PRNGKey(0), n_train=192, n_val=32, n_pca=16,
        hidden=(96, 96), n_epochs=1500, batch_size=64)
    t_train = time.perf_counter() - t0
    p_batch = jnp.asarray(
        np.random.default_rng(0).uniform([0.25, 0.72], [0.31, 0.90],
                                         size=(4096, 2)))
    emu_f = jax.jit(lambda ps: jax.vmap(emu)(ps))
    dt = timed(emu_f, p_batch)
    rows.append((f"emulated w+gt serving (4096 batch)", dt / 4096 * 1e3))
    print(f"  [emulator: {rep.n_train} exact evals + fit in "
          f"{t_train:.0f}s, holdout max_rel {rep.max_rel_err:.1e}]")

    print(f"{'stage':34s} ms/cosmology")
    for name, ms in rows:
        print(f"  {name:32s} {ms:8.3f}")

    # Secondary BASELINE metric: batched C_ell evals/sec/chip.
    f = jax.jit(jax.vmap(cl_fn))
    dt = timed(f, batch)
    evals = b * len(ells_np)
    print(f"\nC_ell throughput: {evals / dt:.3e} ell-evals/sec/chip "
          f"({b} cosmologies x {len(ells_np)} ells in {dt*1e3:.1f} ms)")

    if json_path is not None:
        # Machine-auditable per-stage artifact (VERDICT round-4 item
        # 7): one entry per stage so cross-round regressions are
        # detectable without digging through session notes.
        import json as _json

        payload = {
            "device": str(jax.devices()[0]),
            "batch": b,
            "unit": "ms/cosmology",
            "stages": {name: ms for name, ms in rows},
            "cl_throughput_ell_evals_per_s_per_chip": evals / dt,
            "emulator_holdout_max_rel": float(rep.max_rel_err),
        }
        with open(json_path, "w") as fh:
            _json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"stage artifact written to {json_path}")


def main_with_trace(trace_dir: str, batch_size: int = 100):
    """Run the stage benchmarks under a jax.profiler trace (SURVEY.md
    §5.1 tracing subsystem).  View with TensorBoard or xprof."""
    with jax.profiler.trace(trace_dir):
        main(batch_size)
    print(f"profiler trace written to {trace_dir}")


if __name__ == "__main__":
    json_out = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        json_out = sys.argv[idx + 1]
    if "--trace" in sys.argv:
        idx = sys.argv.index("--trace")
        main_with_trace(sys.argv[idx + 1] if len(sys.argv) > idx + 1
                        else "/tmp/chomp_tpu_trace")
    else:
        main(json_path=json_out)
