"""chomp_tpu: a TPU-native JAX halo-model cosmology framework.

A ground-up rebuild of the capabilities of the reference CHOMP library
(morriscb/chomp — see SURVEY.md for the full structural analysis): linear
matter power (Eisenstein-Hu), Sheth-Tormen mass functions and bias,
1-halo/2-halo nonlinear P(k) with NFW profiles and HODs, Limber-projected
angular spectra, and w(theta)/gamma_t correlation functions — all as pure
jit/vmap/grad-able functions over immutable parameter pytrees, with
fixed-order Gauss-Legendre tensor quadrature and FFTLog Hankel transforms
in place of the reference's adaptive Romberg + Bessel integrals.

Layer map (mirrors SURVEY.md §1, reimagined TPU-first):
    params/grids  ->  chomp defaults.py + scipy substrate
    background    ->  cosmology.SingleEpoch/MultiEpoch (background half)
    linear        ->  cosmology.SingleEpoch (P(k), sigma, nu half)
    mass          ->  mass_function.MassFunction
    hod           ->  hod.HOD*
    profiles      ->  halo.py's NFW y(k, M) internals
    halo          ->  halo.Halo power spectra
    projection    ->  kernel.py (dNdz, WindowFunction, Limber)
    fftlog        ->  (new) Hankel engine replacing kernel.py's
                      Bessel-zero-chunked Romberg integrals
    correlation   ->  correlation.Correlation
    trispectrum   ->  halo_trispectrum.py
    covariance    ->  covariance.py
    mask/curved   ->  (new) survey-footprint mode-coupling covariance,
                      flat-sky (mask.py) and curved-sky (curved.py)
    ssc           ->  (new) super-sample covariance: halo-model power
                      responses + footprint sigma_b^2 on both geometries
    nonlimber     ->  (new) exact low-ell spherical-Bessel projection
                      (FFTLog + analytic Mellin kernels) repairing the
                      Limber approximation, + linear Kaiser RSD
    cmblens       ->  (new) kappa_CMB tracer: single-source-plane
                      window, w_{g kappa_CMB} probes, N_L noise in the
                      covariance ("5x2pt + kappa")
    inference     ->  (new) likelihood / Fisher / MAP / HMC on top of
                      the traced pipelines (one flat parameter vector)
    bandpowers    ->  (new) MASTER mode-coupling / decoupled band
                      powers on a masked sky (quadrature 3j sums, the
                      fused static bandpower-window theory operator)
    sht           ->  (new) TPU-native spherical harmonic transforms
                      (scalar + spin-2 E/B as dense per-m matmul
                      batches): the DATA side of MASTER — masked maps
                      -> pseudo-C_ell -> decoupled band powers
    clusters      ->  (new) cluster number counts with a lognormal
                      mass-observable relation: Poisson + sample
                      variance (Limber per-shell or exact-radial
                      spectral) and the counts x 3x2pt SSC cross
                      blocks ("3x2pt + N")
    nlpower       ->  (new) revised halofit (Takahashi 2012) nonlinear
                      matter power — opt-in mm legs for cosmic shear
                      (matter_power="halofit" on the pipelines)
    neutrino      ->  (new) massive-neutrino sector (EH99 suppression,
                      cb/total-matter species split, traced m_nu)
    rsd           ->  (new) spectroscopic full-shape multipoles
                      P_0/P_2/P_4(k) (Kaiser x FoG on the halo-model
                      spectra) + FKP/Grieb Gaussian covariance
    bao           ->  (new) likelihood-ready D_M/D_H/D_V over r_d with
                      the transfer's own drag sound horizon
    compat        ->  object API mirroring the reference's classes

Baryon feedback: traced CosmoParams.bary_c / bary_eta / a_mod knobs
(HMcode-style matter-profile response + the A_mod linear/nonlinear
interpolation) act on every mm leg of both the halo-model and halofit
routes; defaults are bitwise no-ops with clean gradients.
"""

from chomp_tpu.params import (
    C_OVER_H0,
    DEFAULT_GRID,
    CosmoParams,
    GridSpec,
    HaloParams,
    default_cosmo,
    default_halo,
)

__version__ = "0.1.0"

__all__ = [
    "C_OVER_H0",
    "DEFAULT_GRID",
    "CosmoParams",
    "GridSpec",
    "HaloParams",
    "default_cosmo",
    "default_halo",
    "__version__",
]
