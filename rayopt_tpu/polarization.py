"""Polarization ray tracing (beyond reference: rayopt traces scalar
amplitude only).

Per-interface s/p decomposition with Fresnel amplitude coefficients,
chained as 2x2 complex Jones matrices in a parallel-transported
transverse basis -- the standard polarization-aberration machinery of
production optical design codes.  Conventions:

* basis: s-hat = d_in x n (unit), p-hat = s-hat x d-hat, so the
  (s, p, d) triad is right-handed for both the incident and exiting
  ray; at normal incidence the previous ray's basis carries through
  (any basis is valid there, continuity keeps the chain smooth).
* Fresnel (this basis pairing): rs = (n1 ci - n2 ct)/(n1 ci + n2 ct),
  rp = (n2 ci - n1 ct)/(n2 ci + n1 ct); a perfect mirror is their
  n2 -> inf limit (rs, rp) = (-1, +1).  cos(theta_t) is evaluated in
  complex arithmetic so total internal reflection and absorbing
  (complex-index) media produce the correct amplitude and phase.
* the cumulative Jones matrix maps the field in the entrance basis to
  the exit basis; diattenuation comes from its singular values,
  retardance from the eigenphases of its unitary (polar) factor.

Inputs are the local-frame trace history (y, u, i) exactly as the
jitted engines return it (ops/geometric.trace_rays, or
GeometricTrace.y/u/i) plus the SurfaceTable, so the polarization pass
is a cheap vectorized postprocess over an existing geometric trace:
no extra ray tracing.

All per-ray math is vectorized jax.numpy over the bundle; the surface
loop is Python (system depth is small and static).
"""

import numpy as np
import jax.numpy as jnp

from .ops.surfaces import surface_normal

__all__ = [
    "fresnel_coefficients", "trace_polarization", "PolarizationTrace",
    "jones_diattenuation", "jones_retardance", "jones_to_mueller",
]


def fresnel_coefficients(n1, n2, cos_i):
    """Amplitude coefficients (rs, rp, ts, tp) and the (complex)
    transmitted cosine for an n1 -> n2 interface at incidence cosine
    cos_i.  Complex n2 (metals) and TIR are handled by the complex
    square root; signs follow the module basis convention."""
    n1 = jnp.asarray(n1, jnp.complex128)
    n2 = jnp.asarray(n2, jnp.complex128)
    cos_i = jnp.asarray(cos_i)
    sin_t2 = (n1/n2)**2*(1. - cos_i**2)
    cos_t = jnp.sqrt(1. - sin_t2)
    rs = (n1*cos_i - n2*cos_t)/(n1*cos_i + n2*cos_t)
    rp = (n2*cos_i - n1*cos_t)/(n2*cos_i + n1*cos_t)
    ts = 2.*n1*cos_i/(n1*cos_i + n2*cos_t)
    tp = 2.*n1*cos_i/(n2*cos_i + n1*cos_t)
    return rs, rp, ts, tp, cos_t


def _unit(v, eps=0.):
    n = jnp.sqrt(jnp.square(v).sum(-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v/n


def _cross(a, b):
    return jnp.cross(a, b)


def _perp_fallback(d):
    """A unit vector perpendicular to d: x-hat projected out, y-hat
    where d is along x."""
    ex = jnp.zeros_like(d).at[..., 0].set(1.)
    ey = jnp.zeros_like(d).at[..., 1].set(1.)
    use_y = jnp.abs(d[..., 0:1]) > .9
    seed = jnp.where(use_y, ey, ex)
    v = seed - (seed*d).sum(-1, keepdims=True)*d
    return _unit(v)


def trace_polarization(table, y, u, i, coatings=None,
                       wavelength=None):
    """Chain the per-interface Jones matrices along a traced bundle.

    table: the SurfaceTable used for the trace (rot/mu/n gives frames
    and media).  y, u, i: (S, N, 3) local-frame position/exit/incident
    history from the geometric engines.  coatings: optional
    {surface_index: value} where value is a complex index overriding
    the second medium at that interface (thin-metal idealization) or
    a coatings.CoatingStack evaluated with the multilayer
    characteristic-matrix method (requires `wavelength`, in the same
    unit as the stack thicknesses -- meters for System tables).  The
    geometric refraction is unchanged in either case.

    Returns a dict:
      jones          (N, 2, 2) complex cumulative amplitude matrix
      transmittance  (N,) unpolarized intensity throughput
                     (flux-corrected |J|^2 average)
      s_in, p_in     (N, 3) entrance transverse basis (global frame)
      s_out, p_out   (N, 3) exit transverse basis (global frame)
    """
    rot = np.asarray(table.rot)
    mu = np.asarray(table.mu)
    n_before = np.asarray(table.n_before)
    n_after = np.asarray(table.n_after)
    S = mu.shape[0]
    coatings = coatings or {}
    cdx = np.asarray(getattr(table, "curvature_dx", np.zeros(S)))
    kdx = np.asarray(getattr(table, "conic_dx", np.zeros(S)))
    tor = np.asarray(getattr(table, "toroidal", np.zeros(S)))

    # incoming direction at surface 1, in the global frame
    d_in = jnp.einsum("ij,ni->nj", jnp.asarray(rot[1]), i[1])
    d_in = _unit(d_in)
    s_prev = _perp_fallback(d_in)
    p_prev = _cross(s_prev, d_in)
    s_in, p_in = s_prev, p_prev

    N = y.shape[1]
    jones = jnp.broadcast_to(jnp.eye(2, dtype=jnp.complex128),
                             (N, 2, 2))
    geometry = jones  # basis parallel-transport chain (Fresnel = 1)
    flux = jnp.ones(N)

    for k in range(1, S):
        if mu[k] == 1. and k not in coatings:
            continue  # no optical interface (dummy plane/stop)
        r = jnp.asarray(rot[k])
        d_in = _unit(jnp.einsum("ij,ni->nj", r, i[k]))
        d_out = _unit(jnp.einsum("ij,ni->nj", r, u[k]))
        if tor[k] != 0. or cdx[k] != 0. or kdx[k] != 0.:
            # anamorphic row: the general biconic/toroid normal
            from .ops import kernels as _K
            cx = table.curvature[k] + cdx[k]
            if tor[k] != 0.:
                gx, gy = _K.normal_toroid(
                    y[k][:, 0], y[k][:, 1], cx, table.curvature[k],
                    table.conic[k], table.aspherics[k],
                    table.aspherics_odd[k])
            else:
                gx, gy = _K.normal_biconic(
                    y[k][:, 0], y[k][:, 1], cx,
                    table.conic[k] + kdx[k], table.curvature[k],
                    table.conic[k], table.aspherics[k],
                    table.aspherics_odd[k])
            n_loc = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
        else:
            n_loc = surface_normal(y[k], table.curvature[k],
                                   table.conic[k], table.aspherics[k],
                                   table.aspherics_odd[k])
        nrm = _unit(jnp.einsum("ij,ni->nj", r, n_loc))

        cos_i = jnp.abs((d_in*nrm).sum(-1))
        sv = _cross(d_in, nrm)
        sin_i = jnp.sqrt(jnp.square(sv).sum(-1))
        grazing = sin_i[:, None] > 1e-9
        s_hat = jnp.where(grazing, sv/jnp.where(
            grazing, sin_i[:, None], 1.), s_prev)
        p_i = _cross(s_hat, d_in)
        p_o = _cross(s_hat, d_out)

        n1 = abs(n_before[k])
        n2 = coatings.get(k, abs(n_after[k]))
        stack = n2 if hasattr(n2, "coefficients") else None
        if mu[k] == -1. and k not in coatings:
            # perfect mirror: the n2 -> inf Fresnel limit
            a_s = jnp.full(N, -1.+0j)
            a_p = jnp.full(N, 1.+0j)
            step_flux = jnp.ones(N)
        elif stack is not None:
            # multilayer coating (characteristic matrices)
            if wavelength is None:
                raise ValueError(
                    "CoatingStack coatings need wavelength=")
            n_sub = (stack.substrate if stack.substrate is not None
                     else (n1 if mu[k] == -1. else abs(n_after[k])))
            rs, rp, ts, tp = stack.coefficients(
                n1, n_sub, cos_i, wavelength)
            if mu[k] == -1.:
                a_s, a_p = rs, rp
                step_flux = jnp.ones(N)
            else:
                a_s, a_p = ts, tp
                from .coatings import _cos_in_medium
                cos_t = _cos_in_medium(n1, cos_i, n_sub)
                step_flux = jnp.real(n_sub*cos_t)/(n1*cos_i)
        else:
            rs, rp, ts, tp, cos_t = fresnel_coefficients(
                n1, n2, cos_i)
            if mu[k] == -1.:
                # coated mirror: complex-index Fresnel reflection;
                # the reflectance lives in |r|^2, no flux factor
                a_s, a_p = rs, rp
                step_flux = jnp.ones(N)
            else:
                a_s, a_p = ts, tp
                # intensity flux factor (n2 cos_t)/(n1 cos_i)
                step_flux = jnp.real(n2*cos_t)/(n1*cos_i)
        # rotate the carried basis into this surface's (s, p_in)
        c_ss = (s_hat*s_prev).sum(-1)
        c_sp = (s_hat*p_prev).sum(-1)
        c_ps = (p_i*s_prev).sum(-1)
        c_pp = (p_i*p_prev).sum(-1)
        rotm = jnp.stack(
            [jnp.stack([c_ss, c_sp], -1),
             jnp.stack([c_ps, c_pp], -1)], -2).astype(jnp.complex128)
        fres = jnp.zeros((N, 2, 2), jnp.complex128)
        fres = fres.at[:, 0, 0].set(a_s).at[:, 1, 1].set(a_p)
        jones = jnp.einsum("nij,njk,nkl->nil", fres, rotm, jones)
        geometry = jnp.einsum("nij,njk->nik", rotm, geometry)
        flux = flux*step_flux
        s_prev, p_prev = s_hat, p_o

    # unpolarized intensity throughput: mean singular value squared,
    # flux-corrected
    frob2 = jnp.square(jnp.abs(jones)).sum((-2, -1))
    transmittance = .5*flux*frob2
    return {
        "jones": jones,
        "geometry": geometry,
        "transmittance": transmittance,
        "flux": flux,
        "s_in": s_in, "p_in": p_in,
        "s_out": s_prev, "p_out": p_prev,
    }


def _finite_mask(j):
    """(mask, j_safe): batch entries with any non-finite element
    (vignetted rays) are replaced by the identity so LAPACK converges;
    callers NaN them back."""
    j = np.asarray(j)
    good = np.isfinite(j).all(axis=(-2, -1))
    safe = np.where(good[..., None, None], np.where(
        np.isfinite(j), j, 0.), np.eye(2, dtype=j.dtype))
    return good, safe


def jones_diattenuation(jones):
    """Diattenuation (Tmax - Tmin)/(Tmax + Tmin) from the singular
    values of each 2x2 Jones matrix; NaN for vignetted (NaN) rays."""
    good, j = _finite_mask(jones)
    s = np.linalg.svd(j, compute_uv=False)
    t1, t2 = s[..., 0]**2, s[..., 1]**2
    d = (t1 - t2)/np.where(t1 + t2 == 0, 1., t1 + t2)
    return np.where(good, d, np.nan)


def jones_retardance(jones, geometry=None):
    """Proper retardance (radians): phase spread of the eigenvalues
    of the unitary (polar) factor of J, with the parallel-transport
    rotation Q factored out first when given (J_proper = J Q^T) --
    otherwise a skew ray's geometric basis rotation masquerades as
    circular retardance (Chipman's proper-retardance correction)."""
    j = np.asarray(jones)
    if geometry is not None:
        q = np.asarray(geometry)
        j = np.einsum("...ij,...kj->...ik", j, q.conj())
    good, j = _finite_mask(j)
    uu, s, vh = np.linalg.svd(j)
    w = uu @ vh
    lam = np.linalg.eigvals(w)
    phase = np.angle(lam[..., 0]/lam[..., 1])
    return np.where(good, np.abs(phase), np.nan)


def jones_to_mueller(jones):
    """4x4 Mueller matrix of each Jones matrix
    (M = A (J kron J*) A^-1, A the standard Pauli-basis map)."""
    j = np.asarray(jones)
    a = np.array([[1, 0, 0, 1],
                  [1, 0, 0, -1],
                  [0, 1, 1, 0],
                  [0, 1j, -1j, 0]], complex)
    ainv = np.linalg.inv(a)
    kron = np.einsum("...ij,...kl->...ikjl", j, j.conj())
    kron = kron.reshape(j.shape[:-2] + (4, 4))
    m = np.einsum("ij,...jk,kl->...il", a, kron, ainv)
    return m.real


class PolarizationTrace:
    """Front-end: geometric trace + polarization postprocess.

    Wraps a GeometricTrace bundle (rays_point-style seeding) and
    exposes per-ray Jones/diattenuation/retardance/transmittance
    pupil maps.
    """

    def __init__(self, system, field=(0., 0.), wavelength=None,
                 nrays=32, distribution="hexapolar", clip=True,
                 coatings=None):
        from .trace.geometric import GeometricTrace
        self.system = system
        t = GeometricTrace(system)
        t.rays_point(field, wavelength, nrays=nrays,
                     distribution=distribution, clip=clip,
                     filter=False)
        self.geometric = t
        table = system.table(t.l)
        out = trace_polarization(table, jnp.asarray(t.y),
                                 jnp.asarray(t.u), jnp.asarray(t.i),
                                 coatings=coatings, wavelength=t.l)
        self.jones = np.asarray(out["jones"])
        self.geometry = np.asarray(out["geometry"])
        self.transmittance = np.asarray(out["transmittance"])
        self.flux = np.asarray(out["flux"])
        self.s_in = np.asarray(out["s_in"])
        self.p_in = np.asarray(out["p_in"])
        self.s_out = np.asarray(out["s_out"])
        self.p_out = np.asarray(out["p_out"])

    @property
    def good(self):
        return np.isfinite(self.geometric.y[-1, :, :2]).all(1)

    @property
    def diattenuation(self):
        return jones_diattenuation(self.jones)

    @property
    def retardance(self):
        return jones_retardance(self.jones, self.geometry)

    @property
    def mueller(self):
        return jones_to_mueller(self.jones)

    def pupil_coords(self):
        """Normalized pupil coordinates of the bundle: transverse hit
        positions on the stop surface, scaled to the surviving-bundle
        rim."""
        xy = self.geometric.y[self.system.stop][:, :2]
        r = np.hypot(xy[:, 0], xy[:, 1])
        rim = np.nanmax(np.where(self.good, r, np.nan))
        if not np.isfinite(rim) or rim == 0:
            rim = 1.
        return xy[:, 0]/rim, xy[:, 1]/rim

    def zernike(self, nterms=15):
        """Polarization-aberration pupil fits: Noll-Zernike
        coefficients of the retardance, diattenuation, and intensity
        apodization (1 - T/Tmax) maps over the normalized pupil.

        Returns {name: (coefficients, residual_rms)} -- the standard
        low-order polarization-aberration summary (e.g. retardance
        tilt/defocus terms from coatings and fold mirrors)."""
        from .utils.zernike import fit_zernike
        x, y = self.pupil_coords()
        w = np.where(self.good, 1., 0.)
        t = self.transmittance
        tmax = np.nanmax(np.where(self.good, t, np.nan))
        maps = {
            "retardance": self.retardance,
            "diattenuation": self.diattenuation,
            "apodization": 1. - t/tmax,
        }
        return {name: fit_zernike(x, y, vals, nterms=nterms, w=w)
                for name, vals in maps.items()}

    def vector_field(self, e_in=(1., 0.)):
        """Lab-frame complex output field per ray for a transverse
        input polarization e_in = (Ex, Ey): the per-ray Jones matrix
        (in its s/p bases) applied to the input's s/p decomposition,
        re-expressed on the exit (s_out, p_out) frame and scaled by
        sqrt(flux) (the polarization-independent n cos factors), so
        |E|^2 IS the physical intensity throughput for THIS input --
        a diattenuator extinguishes the blocked polarization here,
        unlike the unpolarized-average `transmittance`."""
        e = np.zeros(3, complex)
        e[:2] = e_in
        n = np.linalg.norm(e)
        if n == 0:
            raise ValueError("zero input polarization")
        e /= n
        a = self.s_in @ e
        b = self.p_in @ e
        j = self.jones
        c_s = j[:, 0, 0]*a + j[:, 0, 1]*b
        c_p = j[:, 1, 0]*a + j[:, 1, 1]*b
        E = (c_s[:, None]*self.s_out.astype(complex)
             + c_p[:, None]*self.p_out.astype(complex))
        return E*np.sqrt(self.flux)[:, None]

    def vector_psf(self, e_in=(1., 0.), pad=4, resample=4):
        """Polarization-aware (vector) point spread function: each
        lab-frame field component rides the exit-pupil phase
        exp(-2 pi i OPD) onto its own Fraunhofer integral and the
        intensities add incoherently across components (the Jones-
        pupil PSF; transverse-FFT approximation, so the z-component
        is carried but small below ~0.5 NA).  With an identity Jones
        chain this reduces exactly to GeometricTrace.psf.

        Returns (p, q, psf) on the same frequency grid conventions as
        GeometricTrace.psf."""
        from .trace.geometric import _grid_resample, _fraunhofer_psf
        g = self.geometric
        radius = self.system[-1].distance
        x, y, o = g.opd(resample=0, radius=radius)
        # the OPD phase oscillates across the pupil; grid it SEPARATELY
        # (smooth, like the scalar psf) and exponentiate on the grid --
        # gridding re/im of the full field would decorrelate the
        # wavefront between ray samples.  The Jones envelope (already
        # flux-scaled physical amplitudes) is smooth; one vector-valued
        # interpolation shares the triangulation across OPD + 6
        # envelope components.
        E = self.vector_field(e_in)
        samples = int(resample*np.sqrt(g.nrays))
        vals = np.column_stack([o, E.real, E.imag])
        gx, _, gv = _grid_resample(x, y, vals, samples)
        go = gv[..., 0]
        lit = np.isfinite(go)
        phase = np.where(lit, np.exp(-2j*np.pi*np.where(lit, go, 0.)),
                         0.)
        grids = []
        for c in range(3):
            env = (np.where(lit, gv[..., 1 + c], 0.)
                   + 1j*np.where(lit, gv[..., 4 + c], 0.))
            grids.append(env*phase)
        return _fraunhofer_psf(grids, gx[1, 0] - gx[0, 0], g.l,
                               self.system.scale, radius, pad)

    def text(self):
        g = self.good
        rows = [
            "Polarization (field bundle, %d/%d rays through):" % (
                g.sum(), g.size),
            "  transmittance  min %.4f  mean %.4f" % (
                self.transmittance[g].min(),
                self.transmittance[g].mean()),
            "  diattenuation  max %.3g" % self.diattenuation[g].max(),
            "  retardance     max %.3g rad" % self.retardance[g].max(),
        ]
        return "\n".join(rows)
