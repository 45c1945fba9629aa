"""chomp-compatible object API.

Mirrors the reference's module/class layout (SURVEY.md §2 inventory) so
a chomp user can port scripts with minimal changes:

    from chomp_tpu.compat import cosmology, mass_function, hod, halo
    from chomp_tpu.compat import kernel, correlation, covariance
    from chomp_tpu.compat import halo_trispectrum, defaults

    cosmo = cosmology.SingleEpoch(0.0)
    mf    = mass_function.MassFunction(0.0, cosmo)
    zheng = hod.HODZheng(1.38e12, 0.15, 1.38e12, 2.7e13, 1.0)
    h     = halo.Halo(0.0, zheng, cosmo)
    ...

Differences from upstream, by design (SURVEY.md §7):
  - objects are thin wrappers over the pure-functional jit/vmap core;
    ``set_*`` mutators rebuild immutable state instead of invalidating
    splines;
  - every evaluation method is array-in/array-out (chomp is scalar);
  - dtype follows jax config (float64 on CPU with x64, float32 on TPU).
"""

from chomp_tpu.compat import (  # noqa: F401
    correlation,
    cosmology,
    covariance,
    defaults,
    halo,
    halo_trispectrum,
    hod,
    kernel,
    mass_function,
)
