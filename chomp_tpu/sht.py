"""TPU-native spherical harmonic transforms (scalar + spin-2 E/B).

Capability extension beyond chomp (the reference has no map-level
machinery at all — upstream:covariance.py consumes analytic survey
areas only; SURVEY.md §2 rows 13): this module supplies the DATA side
of the MASTER band-power analysis in `chomp_tpu.bandpowers` — masked
sky maps -> pseudo-a_lm -> pseudo-C_ell -> decoupled band powers —
so a harmonic-space analysis runs end to end inside the framework
(and inside one jit).

Design (TPU-first):
  - Grid: Gauss-Legendre latitudes x equispaced azimuth.  GL in
    latitude makes the discrete analysis EXACT for band-limited maps
    (n_lat >= lmax+1 integrates P products of degree <= 2 lmax+1);
    the azimuth transform is one FFT (n_phi >= 2 lmax+1).
  - The associated-Legendre / Wigner-d tables are built OFFLINE in
    float64 numpy (stable three-term upward recursions, the same ones
    as the MC referees in tests/sht_referee.py) and padded into ONE
    dense (lmax+1, lmax+1, n_lat) tensor per spin: rows with l < max(m,
    |spin|) are exact zeros.  Analysis and synthesis are then single
    jnp.einsum contractions — (lmax+1) batched (n_map x n_lat) @
    (n_lat x (lmax+1)) matmul stacks that ride the MXU, with zero
    gathers and no per-m Python loop inside jit.
  - Everything is jit/vmap-able; matmuls are pinned to HIGHEST
    precision (bf16 passes would poison the m-sums).

Memory: the dense tables hold 1 (scalar) or 3 (+spin-2) tensors of
(lmax+1)^2 x n_lat floats — 102 MB each at lmax=256 (f32, n_lat=384),
0.8 GB at lmax=512.  For the survey band powers this module feeds
(lmax <= 1-2k, NKA-validated bins) this is the right trade: the
transform is one fused contraction instead of a latency-bound per-m
loop.  (A recursion-on-device O(lmax^2 n_lat) variant would save the
table memory at the cost of a lax.scan dependency chain — measured
slower through the axon dispatch floor; revisit for lmax >> 2k.)

Conventions (identical to the validated MC referees,
tests/sht_referee.py and tests/test_curved.py::_Spin2Sht):
  - Orthonormal lambda_lm = N_lm P_l^m with Condon-Shortley phase;
    a_{l,-m} = (-1)^m conj(a_{lm}) for real scalar fields, so only
    m >= 0 is stored: alm arrays are (..., lmax+1, lmax+1) complex
    indexed [m, l], zero where l < max(m, spin).
  - Spin-2: gamma_pm = Q +- iU; A^{pm}_{lm} = -Integral W gamma_pm
    N_l d^l_{m,pm 2} e^{-im phi}; E = (A^+ + A^-)/2,
    B = (A^+ - A^-)/(2i).  E/B round trip is exact to ~4e-12 in f64
    (asserted in tests/test_sht.py).
  - pseudo_cl(a, b)_l = sum_m (2 - delta_{m0}) Re(conj(a) b) /
    (2l+1): the standard pseudo-spectrum normalization, so an
    UNMASKED band-limited sky returns its input C_l exactly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["SHT", "gl_mask_map"]

_HP = jax.lax.Precision.HIGHEST


def _lambda_dense(lmax: int, x: np.ndarray) -> np.ndarray:
    """Dense (lmax+1, lmax+1, nx) orthonormal lambda_lm(x) indexed
    [m, l, x], zeros for l < m (stable m-diagonal seed + upward l
    recursion; same algebra as tests/sht_referee._sht_lambda_tables,
    referee-validated round trip 7e-12)."""
    x = np.asarray(x, dtype=np.float64)
    sx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    out = np.zeros((lmax + 1, lmax + 1, x.size))
    lam_mm = np.full_like(x, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(lmax + 1):
        out[m, m] = lam_mm
        if m + 1 <= lmax:
            out[m, m + 1] = x * np.sqrt(2.0 * m + 3.0) * lam_mm
        for ell in range(m + 2, lmax + 1):
            a = np.sqrt((4.0 * ell * ell - 1.0) / (ell * ell - m * m))
            b = np.sqrt(((ell - 1.0) ** 2 - m * m)
                        / (4.0 * (ell - 1.0) ** 2 - 1.0))
            out[m, ell] = a * (x * out[m, ell - 1] - b * out[m, ell - 2])
        lam_mm = -np.sqrt((2.0 * m + 3.0) / (2.0 * m + 2.0)) * sx * lam_mm
    return out


def _dmn_dense(n: int, lmax: int, x: np.ndarray) -> np.ndarray:
    """Dense (lmax+1, lmax+1, nx) Wigner-d d^l_{m,n}(x) for fixed
    n in {+-2}, indexed [m, l, x], zeros for l < max(m, |n|)
    (closed-form lmin seeds + the standard upward three-term
    recursion; same algebra as tests/test_curved._sht_dmn_tables,
    sympy/orthogonality-validated there)."""
    from math import lgamma

    x = np.asarray(x, dtype=np.float64)
    ch = np.sqrt((1.0 + x) / 2.0)
    sh = np.sqrt((1.0 - x) / 2.0)
    out = np.zeros((lmax + 1, lmax + 1, x.size))
    for m in range(lmax + 1):
        lmin = max(m, abs(n))
        if lmin > lmax:
            break
        if lmin == m and m >= abs(n):
            lognorm = 0.5 * (lgamma(2 * m + 1) - lgamma(m + n + 1)
                             - lgamma(m - n + 1))
            seed = np.exp(lognorm) * ch ** (m + n) * (-sh) ** (m - n)
        elif n == 2:          # m < 2: d^2_{m,2} = (-1)^m d^2_{2,m}
            lognorm = 0.5 * (lgamma(5) - lgamma(2 + m + 1)
                             - lgamma(2 - m + 1))
            seed = ((-1.0) ** (m - 2) * np.exp(lognorm)
                    * ch ** (2 + m) * (-sh) ** (2 - m))
        else:                 # n == -2, m < 2: d^2_{m,-2} = d^2_{2,-m}
            k = -m
            lognorm = 0.5 * (lgamma(5) - lgamma(2 + k + 1)
                             - lgamma(2 - k + 1))
            seed = np.exp(lognorm) * ch ** (2 + k) * (-sh) ** (2 - k)
        out[m, lmin] = seed
        prev = np.zeros_like(x)
        for li in range(lmin, lmax):
            ell = float(li)
            a = ell * np.sqrt(((ell + 1) ** 2 - m * m)
                              * ((ell + 1) ** 2 - n * n))
            b = (2 * ell + 1) * (ell * (ell + 1) * x - m * n)
            c = (ell + 1) * np.sqrt(max(ell * ell - m * m, 0.0)
                                    * max(ell * ell - n * n, 0.0))
            nxt = (b * out[m, li] - c * prev) / a
            prev = out[m, li]
            out[m, li + 1] = nxt
    return out


class SHT:
    """Batched scalar (and optionally spin-2) spherical harmonic
    transforms on a Gauss-Legendre x FFT grid, as fused jnp einsums.

    Parameters
    ----------
    lmax : band limit.
    n_lat : GL latitudes (default lmax + 1 — the exactness minimum
        for analysis of band-limited maps; use ~1.5x for maps with
        power beyond lmax, e.g. sharp masks).
    n_phi : azimuth samples (default the next even >= 2 lmax + 2).
    spin2 : also build the d^l_{m,+-2} tables (doubles table memory).
    dtype : table/compute dtype (jnp.float64 needs x64 enabled; the
        default float32 is the TPU serving path — pseudo-C_ell sums
        are dominated by the HIGHEST-precision matmuls).

    Maps are (..., n_lat, n_phi) arrays on theta[i] = arccos(x_gl[i])
    (descending x — NORTH pole first), phi[j] = 2 pi j / n_phi.
    alm arrays are (..., lmax+1, lmax+1) complex, indexed [m, l].
    """

    def __init__(self, lmax: int, n_lat: int | None = None,
                 n_phi: int | None = None, spin2: bool = False,
                 dtype=jnp.float32):
        if n_lat is None:
            n_lat = lmax + 1
        if n_phi is None:
            n_phi = 2 * lmax + 2
        if n_phi < 2 * lmax + 1:
            raise ValueError(f"n_phi={n_phi} aliases m <= {lmax}: need "
                             f">= {2 * lmax + 1}")
        if n_lat < lmax + 1:
            raise ValueError(f"n_lat={n_lat} < lmax+1: GL analysis "
                             "would not be exact at the band limit")
        self.lmax, self.n_lat, self.n_phi = int(lmax), int(n_lat), int(n_phi)
        xg, wq = np.polynomial.legendre.leggauss(self.n_lat)
        order = np.argsort(-xg)               # north pole (x=+1) first
        self.x, self.w_quad = xg[order], wq[order]
        self.theta = np.arccos(self.x)
        self.phi = 2.0 * np.pi * np.arange(self.n_phi) / self.n_phi
        cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
        self._rdt, self._cdt = dtype, cdtype
        # One dense table per spin family — the GL quadrature weights
        # are applied to the (tiny) FFT output at analysis time, not
        # baked into a second copy of the tables.
        self._lam = jnp.asarray(_lambda_dense(self.lmax, self.x),
                                dtype=dtype)
        self._wq = jnp.asarray(self.w_quad, dtype=dtype)
        self._m_fac = jnp.asarray(
            np.where(np.arange(self.lmax + 1) == 0, 1.0, 2.0),
            dtype=dtype)
        if spin2:
            nl = np.sqrt((2.0 * np.arange(self.lmax + 1) + 1.0)
                         / (4.0 * np.pi))
            self._dp = jnp.asarray(
                _dmn_dense(2, self.lmax, self.x) * nl[None, :, None],
                dtype=dtype)
            self._dm = jnp.asarray(
                _dmn_dense(-2, self.lmax, self.x) * nl[None, :, None],
                dtype=dtype)
        else:
            self._dp = self._dm = None

    # -- scalar ---------------------------------------------------------

    def analyze(self, maps):
        """(..., n_lat, n_phi) real maps -> (..., lmax+1, lmax+1)
        pseudo-a_lm for m >= 0 ([m, l]; exact a_lm of the map's
        band-limited part).  Mask the maps BEFORE calling for
        pseudo-spectra."""
        maps = jnp.asarray(maps, dtype=self._rdt)
        f = jnp.fft.rfft(maps, axis=-1)[..., :self.lmax + 1] \
            * (2.0 * np.pi / self.n_phi) * self._wq[:, None]
        return jnp.einsum("...xm,mlx->...ml", f, self._lam,
                          precision=_HP)

    def synthesize(self, alm):
        """(..., lmax+1, lmax+1) [m, l] complex (m >= 0, real-field
        convention) -> real maps (..., n_lat, n_phi)."""
        alm = jnp.asarray(alm, dtype=self._cdt)
        spec = jnp.einsum("...ml,mlx->...xm", alm, self._lam,
                          precision=_HP)
        # rfft-domain coefficients: map = sum_m Re over e^{im phi}
        # with the referee's conjugation convention (validated round
        # trip); pad the rfft axis out to n_phi//2+1.
        pad = self.n_phi // 2 + 1 - (self.lmax + 1)
        spec = jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, pad)])
        return jnp.fft.irfft(spec, n=self.n_phi, axis=-1) * self.n_phi

    # -- spin-2 ----------------------------------------------------------

    def _need_spin2(self):
        if self._dp is None:
            raise ValueError("build SHT(..., spin2=True) for spin-2 "
                             "transforms")

    def analyze_spin2(self, q, u):
        """Spin-2 analysis: (Q, U) real maps -> (e_lm, b_lm) for
        m >= 0 (each (..., lmax+1, lmax+1) [m, l]).  Mask Q and U
        BEFORE calling for pseudo-spectra."""
        self._need_spin2()
        gp = jnp.asarray(q, dtype=self._rdt) \
            + 1j * jnp.asarray(u, dtype=self._rdt)
        fac = 2.0 * np.pi / self.n_phi
        wgt = fac * self._wq[:, None]
        wp = jnp.fft.fft(gp, axis=-1)[..., :self.lmax + 1] * wgt
        wm = jnp.fft.fft(jnp.conj(gp), axis=-1)[..., :self.lmax + 1] * wgt
        a_p = -jnp.einsum("...xm,mlx->...ml", wp, self._dp,
                          precision=_HP)
        a_m = -jnp.einsum("...xm,mlx->...ml", wm, self._dm,
                          precision=_HP)
        return 0.5 * (a_p + a_m), (a_p - a_m) / 2.0j

    def synthesize_spin2(self, e_lm, b_lm=None):
        """(e_lm[, b_lm]) -> (Q, U) real maps.  b_lm=None means B=0
        (the Limber E-only shear field)."""
        self._need_spin2()
        e_lm = jnp.asarray(e_lm, dtype=self._cdt)
        a_p = e_lm if b_lm is None else e_lm + 1j * jnp.asarray(
            b_lm, dtype=self._cdt)
        a_m = e_lm if b_lm is None else e_lm - 1j * jnp.asarray(
            b_lm, dtype=self._cdt)
        # gamma_+ = -sum_{m>=0} [A+ N d_{m,2} e^{im phi}
        #                        + conj(A-) N d_{m,-2} e^{-im phi}]
        # (negative m folded by the real-field conventions; m=0 must
        # not be double-counted).
        sp = -jnp.einsum("...ml,mlx->...xm", a_p, self._dp,
                         precision=_HP)
        sm = -jnp.einsum("...ml,mlx->...xm", jnp.conj(a_m), self._dm,
                         precision=_HP)
        m0 = 0.5 * (sp[..., :1] + sm[..., :1])
        spec_shape = sp.shape[:-1] + (self.n_phi,)
        spec = jnp.zeros(spec_shape, dtype=self._cdt)
        spec = spec.at[..., :self.lmax + 1].set(
            jnp.concatenate([m0, sp[..., 1:]], axis=-1))
        neg = jnp.concatenate([m0, sm[..., 1:]], axis=-1)
        spec = spec.at[..., -self.lmax:].add(neg[..., 1:][..., ::-1])
        gp = jnp.fft.ifft(spec, axis=-1) * self.n_phi
        return jnp.real(gp), jnp.imag(gp)

    # -- spectra ---------------------------------------------------------

    def pseudo_cl(self, alm_a, alm_b=None):
        """Pseudo-C_l = sum_m (2 - delta_{m0}) Re(conj(a) b) / (2l+1)
        over m >= 0 (..., lmax+1).  Unmasked band-limited input
        returns its exact spectrum."""
        a = jnp.asarray(alm_a)
        b = a if alm_b is None else jnp.asarray(alm_b)
        s = jnp.einsum("m,...ml->...l",
                       self._m_fac,
                       jnp.real(jnp.conj(a) * b), precision=_HP)
        ells = jnp.arange(self.lmax + 1, dtype=self._rdt)
        return s / (2.0 * ells + 1.0)

    # -- pytree protocol --------------------------------------------------
    #
    # SHT registers as a pytree with the TABLES as leaves: under the
    # axon remote-TPU tunnel, a jit that CLOSES OVER the tables ships
    # them inside the serialized program (hundreds of MB -> HTTP 413);
    # passing the SHT object as a jit ARGUMENT moves them to the
    # device-buffer path.  jit(lambda sht, maps: sht.analyze(maps)) is
    # the supported pattern at scale.

    def tree_flatten(self):
        children = (self._lam, self._wq, self._m_fac, self._dp,
                    self._dm)
        aux = (self.lmax, self.n_lat, self.n_phi, self._dp is not None,
               self._rdt == jnp.float64)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        lmax, n_lat, n_phi, spin2, is64 = aux
        obj = object.__new__(cls)
        obj.lmax, obj.n_lat, obj.n_phi = lmax, n_lat, n_phi
        xg, wq = np.polynomial.legendre.leggauss(n_lat)
        order = np.argsort(-xg)
        obj.x, obj.w_quad = xg[order], wq[order]
        obj.theta = np.arccos(obj.x)
        obj.phi = 2.0 * np.pi * np.arange(n_phi) / n_phi
        obj._rdt = jnp.float64 if is64 else jnp.float32
        obj._cdt = jnp.complex128 if is64 else jnp.complex64
        (obj._lam, obj._wq, obj._m_fac, obj._dp, obj._dm) = children
        return obj

    # -- grids -----------------------------------------------------------

    def grid_maps(self, fn):
        """Evaluate fn(theta, phi) (numpy, broadcasting) on the grid —
        convenience for masks/beams."""
        th = self.theta[:, None]
        ph = self.phi[None, :]
        return np.broadcast_to(np.asarray(fn(th, ph), dtype=float),
                               (self.n_lat, self.n_phi)).copy()


def gl_mask_map(sht: SHT, mask) -> np.ndarray:
    """The (n_lat, n_phi) weight map of an AZIMUTHAL chomp_tpu.curved
    mask object (SphericalCapMask / ProfileCurvedMask /
    UniformSphereMask) evaluated on the SHT grid from its theta
    profile.  For a PixelSphereMask (which keeps only pair functions,
    not the map) pass your own weight map resampled to the grid."""
    from chomp_tpu.curved import (ProfileCurvedMask, SphericalCapMask,
                                  UniformSphereMask)

    if isinstance(mask, UniformSphereMask):
        return np.ones((sht.n_lat, sht.n_phi))
    if isinstance(mask, SphericalCapMask):
        w = (sht.theta <= mask.radius_rad).astype(float)
        return np.repeat(w[:, None], sht.n_phi, axis=1)
    if isinstance(mask, ProfileCurvedMask):
        w = np.interp(sht.theta, mask._theta, mask._w,
                      left=float(mask._w[0]), right=0.0)
        return np.repeat(w[:, None], sht.n_phi, axis=1)
    raise TypeError(f"no grid rule for mask type {type(mask).__name__}; "
                    "pass an explicit (n_lat, n_phi) weight map instead")


jax.tree_util.register_pytree_node(
    SHT, SHT.tree_flatten, SHT.tree_unflatten)
