"""Parameter/config layer invariants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu.params import DEFAULT_GRID, GridSpec, default_cosmo, default_halo


def test_gridspec_static_and_hashable():
    g1 = GridSpec()
    g2 = GridSpec()
    assert hash(g1) == hash(g2) and g1 == g2
    g3 = g1.replace(n_mass=1024)
    assert g3 != g1 and g3.n_mass == 1024 and g1.n_mass == GridSpec.n_mass
    # Usable as a jit-static argument.
    calls = []

    @jax.jit
    def f(x):
        calls.append(1)
        return x + DEFAULT_GRID.n_mass

    f(jnp.asarray(1.0))
    f(jnp.asarray(2.0))
    assert len(calls) == 1  # no retrace


def test_cosmo_pytree_roundtrip(fiducial):
    leaves, treedef = jax.tree_util.tree_flatten(fiducial)
    # 9 core + m_nu, n_nu (neutrinos) + bary_c, bary_eta, a_mod (baryons)
    assert len(leaves) == 14
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(back.sigma_8) == float(fiducial.sigma_8)
    # Derived quantities.
    np.testing.assert_allclose(float(fiducial.omega_k0), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(fiducial.omega_c0), 0.278 - 0.046,
                               rtol=1e-12)
    np.testing.assert_allclose(float(fiducial.rho_bar), 2.7754e11 * 0.278,
                               rtol=1e-12)


def test_halo_params_defaults_match_survey():
    h = default_halo()
    assert float(h.stq) == 0.3
    assert float(h.st_little_a) == 0.707
    assert float(h.c0) == 9.0
    assert float(h.beta) == -0.13
    assert float(h.delta_v) == -1.0


def test_compat_defaults_dicts():
    from chomp_tpu.compat import defaults

    assert defaults.default_params["omega_m0"] == 0.278
    assert defaults.default_halo_params["st_little_a"] == 0.707
    assert defaults.default_limits["k_min"] == 1e-3
    c = defaults.cosmo_from_dict({"omega_m0": 0.3, "omega_l0": 0.7})
    assert float(c.omega_m0) == 0.3


def test_diagnostics_helpers(fiducial):
    from chomp_tpu.utils.diagnostics import nan_guard, stage_timer

    sink = {}
    with stage_timer("unit", sink):
        _ = jnp.sum(jnp.ones(8))
    assert "unit" in sink and sink["unit"] >= 0.0
    with nan_guard():
        assert bool(jax.config.jax_debug_nans) is True
    assert bool(jax.config.jax_debug_nans) is False


def test_validate_params_catches_unphysical():
    """Host-side physicality checks (jit code cannot raise; NaN would
    otherwise propagate silently — round-1 verify-skill rough edge)."""
    import dataclasses

    from chomp_tpu import default_cosmo, default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.utils.diagnostics import validate_params

    assert validate_params(cosmo=default_cosmo(),
                           halo_params=default_halo(),
                           hod=default_hod(), grid=DEFAULT_GRID) == []
    bad = default_cosmo(omega_m0=-0.1)
    probs = validate_params(cosmo=bad)
    assert any("omega_m0" in p for p in probs)
    # Strongly closed universe: the negative-curvature term drives
    # E^2(z) < 0 at moderate z (H^2 < 0 -> NaN distances downstream).
    wild = default_cosmo(omega_l0=5.0)
    probs = validate_params(cosmo=wild)
    assert any("E^2" in p for p in probs), probs
    # Degenerate HOD: M_min far above the mass range.
    dead_hod = default_hod(log10_m_min=19.0, log10_m_0=19.0)
    probs = validate_params(cosmo=default_cosmo(), hod=dead_hod,
                            grid=DEFAULT_GRID)
    assert any("no galaxies" in p for p in probs), probs
    # Advisor round-2: a batched dark-energy leaf with SCALAR omega_m0
    # must still broadcast against the z probe (the batch size is the
    # max over all leaves, not omega_m0's).
    import jax.numpy as jnp

    bad_batch = dataclasses.replace(
        default_cosmo(), omega_l0=jnp.asarray([-2.0, 0.722]),
        w0=jnp.asarray(0.0))
    probs = validate_params(cosmo=bad_batch)
    assert any("E^2" in p for p in probs), probs
    ok_batch = dataclasses.replace(default_cosmo(),
                                   w0=jnp.asarray([-1.0, -0.9]))
    assert validate_params(cosmo=ok_batch) == []


def test_sweep_validate_raises():
    import jax.numpy as jnp
    import pytest

    from chomp_tpu import default_cosmo
    from chomp_tpu.parallel.sweep import broadcast_cosmo, sweep

    batch = broadcast_cosmo(default_cosmo(),
                            omega_m0=jnp.asarray([0.3, -0.2]))
    with pytest.raises(ValueError, match="omega_m0"):
        sweep(lambda c: c.omega_m0, batch, validate=True)
