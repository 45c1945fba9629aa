"""chomp ``defaults.py`` equivalent: fiducial parameter dicts.

upstream:defaults.py (SURVEY.md §2 row 1, Appendix B.0).  The dicts use
chomp's key names; converters map them onto the functional core's
pytrees.  ``default_precision`` is honored through its GridSpec analog
(fixed quadrature orders replace Romberg tolerances — the mapping is
documented per key).
"""

from __future__ import annotations

from chomp_tpu.params import DEFAULT_GRID, default_cosmo, default_halo

default_params = {
    "omega_m0": 0.278,
    "omega_b0": 0.046,
    "omega_l0": 0.722,
    "h": 0.7,
    "sigma_8": 0.811,
    "n_scalar": 0.960,
    "cmb_temp": 2.726,
    "w0": -1.0,
    "wa": 0.0,
}

default_halo_params = {
    "stq": 0.3,
    "st_little_a": 0.707,
    "c0": 9.0,
    "beta": -0.13,
    "alpha": -1.0,
    # Convention sentinels (HaloParams docstring): -1 selects the default
    # fit forms (Bryan-Norman delta_v, NFW97 delta_c); -2/-3 the
    # alternative/fixed forms; > 0 a literal value.
    "delta_v": -1.0,
    "delta_c": -1.0,
}

default_limits = {
    "k_min": 1.0e-3,
    "k_max": 1.0e2,
    "mass_min": 1.0e9,
    "mass_max": 1.0e16,
}

# chomp's adaptive-Romberg precision dict; here each entry maps to the
# fixed-order grid that the test suite certifies by order doubling
# (SURVEY.md §7 design rules).
default_precision = {
    "grid_spec": DEFAULT_GRID,
    "global_precision": "replaced by GridSpec quadrature orders",
    "divmax": "n/a (fixed-order Gauss-Legendre)",
    "kernel_bessel_limit": "n/a (FFTLog handles the oscillations)",
}


def cosmo_from_dict(cosmo_dict=None):
    d = dict(default_params)
    if cosmo_dict:
        d.update(cosmo_dict)
    return default_cosmo(
        omega_m0=d["omega_m0"], omega_b0=d["omega_b0"],
        omega_l0=d["omega_l0"], h=d["h"], sigma_8=d["sigma_8"],
        n_s=d.get("n_scalar", d.get("n_s", 0.960)),
        t_cmb=d.get("cmb_temp", d.get("t_cmb", 2.726)),
        w0=d.get("w0", -1.0), wa=d.get("wa", 0.0),
    )


def halo_from_dict(halo_dict=None):
    d = dict(default_halo_params)
    if halo_dict:
        d.update(halo_dict)
    return default_halo(**d)
