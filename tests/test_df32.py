"""Two-float compensated contraction (ops.df32) + fused lattice route."""

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu.ops import df32


def test_two_sum_exact():
    a = jnp.asarray(np.float32(1.0))
    b = jnp.asarray(np.float32(1e-8))
    s, e = df32.two_sum(a, b)
    # 1 + 1e-8 rounds to 1 in f32; the residual must carry the 1e-8.
    assert float(s) == 1.0
    np.testing.assert_allclose(float(e), 1e-8, rtol=1e-6)


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 2.0, 256).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, 256).astype(np.float32))
    p, e = df32.two_prod(a, b)
    exact = (np.asarray(a, np.float64) * np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(p, np.float64)
                               + np.asarray(e, np.float64), exact, rtol=0,
                               atol=0)


_HOSTILE = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from chomp_tpu.ops import df32

rng = np.random.default_rng(1)
n, m = 1024, 8
c64 = rng.lognormal(0.0, 2.0, n)                     # positive, spiky
a64 = rng.normal(0.0, 1.0, (m, n))                   # oscillating rows
w_true = a64 @ c64
a64 -= np.outer(w_true / (c64 @ c64) * 0.9999, c64)  # force cancellation
w_true = a64 @ c64                                   # ~1e4x smaller
amp = np.abs(a64 * c64).sum(1) / np.abs(w_true)
assert np.min(amp) > 1e3                             # genuinely hostile

c32 = jnp.asarray(c64.astype(np.float32))
ref = a64 @ np.asarray(c32, np.float64)              # isolates accum error
ours = np.asarray(jax.jit(lambda c: df32.df_contract(c, a64))(c32),
                  np.float64)
plain = np.asarray(
    jnp.matmul(c32, jnp.asarray(a64.astype(np.float32)).T,
               precision=jax.lax.Precision.HIGHEST), np.float64)
rel_ours = np.max(np.abs(ours / ref - 1.0))
rel_plain = np.max(np.abs(plain / ref - 1.0))
assert rel_ours < 5e-6, f"compensated contraction lost: {{rel_ours}}"
assert rel_plain > 1e-2, f"case not hostile enough: plain={{rel_plain}}"
print("OK", rel_ours, rel_plain)
"""


def test_df_contract_cancellation_hostile():
    """A @ c with >1e3x cancellation: the two-float contraction tracks
    f64 to ~5e-8 where the plain f32 HIGHEST matmul loses >1e-2.

    Subprocess with --xla_backend_optimization_level=0: the TPU backend
    compiles the EFTs exactly as written; CPU LLVM -O2 partially defeats
    them (see ops/df32.py backend note), so the CPU regression test pins
    the faithful-codegen behavior."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_backend_optimization_level=0")
    r = subprocess.run([sys.executable, "-c",
                        _HOSTILE.format(repo=repo)],
                       env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("OK")


def test_df_contract_cpu_degraded_still_beats_plain():
    """In-process (CPU -O2) the EFTs are partially defeated by LLVM
    codegen, but the compensated path must still beat plain f32 by >10x
    on the hostile case — the documented CPU floor."""
    rng = np.random.default_rng(1)
    n, m = 1024, 8
    c64 = rng.lognormal(0.0, 2.0, n)
    a64 = rng.normal(0.0, 1.0, (m, n))
    w_true = a64 @ c64
    a64 -= np.outer(w_true / (c64 @ c64) * 0.9999, c64)
    c32 = jnp.asarray(c64.astype(np.float32))
    ref = a64 @ np.asarray(c32, np.float64)
    ours = np.asarray(jax.jit(lambda c: df32.df_contract(c, a64))(c32),
                      np.float64)
    plain = np.asarray(
        jnp.matmul(c32, jnp.asarray(a64.astype(np.float32)).T,
                   precision=jax.lax.Precision.HIGHEST), np.float64)
    rel_ours = np.max(np.abs(ours / ref - 1.0))
    rel_plain = np.max(np.abs(plain / ref - 1.0))
    assert rel_ours < 2e-3, f"CPU floor blown: {rel_ours}"
    assert rel_ours < 0.1 * rel_plain, (rel_ours, rel_plain)


def test_df_contract_f64_passthrough():
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.uniform(0.1, 1.0, 64))
    a = rng.normal(size=(4, 64))
    assert c.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(df32.df_contract(c, a)), a @ c,
                               rtol=1e-12)


def test_fused_lattice_route_equals_two_step(fiducial):
    """limber_wtheta_fft == limber_cl_fft -> wtheta_from_cl_fused (the
    operator composition is exact in f64)."""
    from chomp_tpu import correlation, limber_fft, linear, projection
    from chomp_tpu.params import DEFAULT_GRID as grid

    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    win = projection.WindowGalaxy(dist=dist)
    ln_k = limber_fft.k_lattice(grid)
    p = linear.linear_power(fiducial, jnp.asarray(np.exp(ln_k)))
    theta_key = correlation.theta_bins_deg(grid)
    ells_np = correlation.ell_grid(grid)[0]
    for mu in (0.0, 2.0):
        cl = limber_fft.limber_cl_fft(fiducial, win, win, ells_np, p, grid)
        w_two = correlation.wtheta_from_cl_fused(cl, theta_key, grid, mu)
        w_one = limber_fft.limber_wtheta_fft(fiducial, win, win, theta_key,
                                             p, grid, mu=mu)
        np.testing.assert_allclose(np.asarray(w_one), np.asarray(w_two),
                                   rtol=1e-10, err_msg=f"mu={mu}")
