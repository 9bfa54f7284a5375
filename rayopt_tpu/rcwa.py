"""Rigorous coupled-wave analysis (RCWA) for 1-D lamellar gratings.

The scalar blaze model (gratings.py) is only valid in the d >> lambda
regime; this module solves Maxwell's equations exactly for binary and
staircase-approximated surface-relief gratings in the classical
(planar) mount, TE and TM, in the conical (off-plane) mount with
full s/p coupling (rcwa1d_conical), and for crossed (doubly-periodic)
pixel-grid gratings (rcwa2d, Li's 2-D factorization), with lossless
or absorbing materials --
the electromagnetic complement that answers *how much light* each
order carries when the groove spacing approaches the wavelength.

Formulation: Moharam, Grann, Pommet & Gaylord's coupled-wave
eigenproblem (JOSA A 12, 1068 (1995)) with Li's inverse-rule
factorization for TM (JOSA A 13, 1870 (1996)), composed with the
Redheffer star-product S-matrix recursion (Li, JOSA A 13, 1024
(1996)) rather than MGP95's enhanced transmittance matrices: the
ETM's layer matching matrix a = (W^-1 f + V^-1 g)/2 goes singular as
the truncation order grows (deeply evanescent modes see matched
media, so its rows cancel to O(n^2/alpha^2); measured cond ~ 1e17 at
N = 60), while the S-matrix only ever inverts well-conditioned
I - r r' blocks and keeps every exponential decaying.  Derivation
notes inline; sign conventions follow exp(-i omega t) like
physical.py.

Design note (TPU): the per-layer eigenproblem is a general complex
eigendecomposition, which XLA does not lower on accelerator backends
at all -- and the matrices are (2N+1)^2 with N ~ 10..50, microseconds
of work.  This is deliberately a host-side float64 NumPy solver (like
the aiming front-end); the hot paths of the framework remain the ray
engines.  The reference (quartiq/rayopt) has no grating support of
any kind.
"""

from collections import namedtuple

import numpy as np

__all__ = [
    "Layer", "uniform_layer", "lamellar_layer", "blazed_layers",
    "rcwa1d", "rcwa1d_conical", "RcwaResult", "RcwaConicalResult",
    "Layer2", "crossed_layer", "pillar_layer", "rcwa2d",
    "Rcwa2dResult", "grating_order_weights",
]


#: one grating slice: thickness (same unit as wavelength/period) and
#: a piecewise-constant index profile over one period -- widths are
#: fractions of the period summing to 1, indices the (possibly
#: complex) refractive index of each segment
Layer = namedtuple("Layer", "thickness widths indices")


def uniform_layer(thickness, n):
    """A homogeneous film slice (reduces RCWA to thin-film optics)."""
    return Layer(float(thickness), (1.,), (n,))


def lamellar_layer(thickness, fill, n_ridge, n_groove):
    """A binary (lamellar) grating slice: `fill` fraction of the
    period at n_ridge, the rest at n_groove."""
    fill = float(fill)
    if not 0. < fill < 1.:
        raise ValueError("fill must be in (0, 1)")
    return Layer(float(thickness), (fill, 1. - fill),
                 (n_ridge, n_groove))


def blazed_layers(depth, n_ridge, n_groove, nslices=16):
    """Staircase approximation of a sawtooth (blazed) surface-relief
    profile of total `depth`: nslices lamellar slices whose fill
    fraction ramps linearly.  Slice l (from the incidence side) has
    ridge fraction (l + .5)/nslices -- the tooth grows toward the
    substrate.

    The glass column is thickest at x = 0 and thins with x, so the
    transmitted phase ramp is -2 pi x/period per wavelength of depth:
    at depth = wavelength/(n_ridge - n_groove) the blaze concentrates
    into order m = -1 (order +1 for the mirrored profile).
    """
    t = depth/float(nslices)
    return [lamellar_layer(t, (l + .5)/nslices, n_ridge, n_groove)
            for l in range(nslices)]


def _eps_fourier(widths, indices, order):
    """Fourier coefficients eps_h, h = -order..order, of the
    piecewise-constant permittivity profile (and of its reciprocal,
    for Li's inverse rule)."""
    widths = np.asarray(widths, float)
    if abs(widths.sum() - 1.) > 1e-9:
        raise ValueError("segment widths must sum to 1")
    eps = np.asarray(indices, complex)**2
    x = np.concatenate([[0.], np.cumsum(widths)])
    h = np.arange(-2*order, 2*order + 1)
    out = []
    for val in (eps, 1./eps):
        c = np.zeros(h.shape, complex)
        nz = h != 0
        # integral of val_j exp(-2 pi i h x) over each segment
        e = np.exp(-2j*np.pi*np.outer(h[nz], x))
        c[nz] = (val[None, :]*(e[:, 1:] - e[:, :-1])).sum(1) \
            / (-2j*np.pi*h[nz])
        c[~nz] = (val*widths).sum()
        out.append(c)
    return out  # [eps_h, recip_h], each length 4*order+1


def _toeplitz(coeffs, order):
    """E[m, n] = c_{m-n} from coefficients indexed -2N..2N."""
    n = 2*order + 1
    m = np.arange(n)
    return np.asarray(coeffs)[2*order + m[:, None] - m[None, :]]


def _kz(n_medium, alpha):
    """Normalized z-wavevector sqrt(n^2 - alpha^2): positive real for
    propagating orders, positive imaginary (decaying) for evanescent
    ones."""
    v = np.asarray(n_medium, complex)**2 - alpha**2
    kz = np.sqrt(v)
    # principal sqrt gives Re >= 0; flip the branch where the wave
    # would grow (lossy media put the cut elsewhere)
    return np.where(kz.imag < 0, -kz, kz)


def _modal(A):
    """Eigen-decomposition of a layer's coupled-wave matrix with the
    decaying branch of q = sqrt(eigenvalue): Re q >= 0 (exp(-k0 q z)
    decays into the layer both ways), and for purely imaginary q
    (lossless propagating modes) Im q < 0, so the forward factor
    exp(-k0 q z) = exp(+i k0 |q| z) advances in +z exactly like the
    cover convention q0 = -i kz.  Mixing branches is not benign: a
    slice that resembles the cover then pairs "forward cover" with
    "backward layer" columns and the interface system goes exactly
    singular.  Hermitian A (lossless TE) takes the exact eigh path."""
    if np.abs(A - A.conj().T).max() <= 1e-12*np.abs(A).max():
        w, W = np.linalg.eigh(A)
        w = w.astype(complex)
    else:
        w, W = np.linalg.eig(A)
    q = np.sqrt(w)
    q = np.where(q.real < 0, -q, q)
    q = np.where((q.real <= 1e-12*np.abs(q)) & (q.imag > 0), -q, q)
    return q, W


def _interface(Wa, Va, Wb, Vb):
    """S-matrix of the modal interface between regions a and b.

    Continuity Wa(a+ + a-) = Wb(b+ + b-), Va(a+ - a-) = Vb(b+ - b-)
    solved for the outgoing (a-, b+) in terms of the incoming
    (a+, b-) as ONE block system

        [ Wa  -Wb ] [a-]   [-Wa   Wb ] [a+]
        [-Va  -Vb ] [b+] = [-Va  -Vb ] [b-]

    rather than via P = Wa^-1 Vb products: Va is exactly singular at
    a Wood anomaly (a grazing order has kz = 0, so the cover V row
    vanishes) and V = W q is singular whenever a layer mode sits at
    cutoff -- the joint system stays solvable there (the degenerate
    mode still carries an E-field continuity row).
    """
    M = np.block([[Wa, -Wb], [-Va, -Vb]])
    R = np.block([[-Wa, Wb], [-Va, -Vb]])
    nm = Wa.shape[0]
    sol = np.linalg.solve(M, R)
    return (sol[:nm, :nm], sol[:nm, nm:],
            sol[nm:, :nm], sol[nm:, nm:])


def _star(Sa, Sb):
    """Redheffer star product: compose [a-; b+] = S [a+; b-] blocks
    of two adjacent sections.  Only (I - r r')-type inverses appear,
    which stay well-conditioned for physical (|r| <= 1) sections."""
    A11, A12, A21, A22 = Sa
    B11, B12, B21, B22 = Sb
    nm = A11.shape[0]
    eye = np.eye(nm, dtype=complex)
    m1 = np.linalg.solve(eye - B11 @ A22,
                         np.concatenate([B11 @ A21, B12], 1))
    m2 = np.linalg.solve(eye - A22 @ B11,
                         np.concatenate([A21, A22 @ B12], 1))
    s11 = A11 + A12 @ m1[:, :nm]
    s12 = A12 @ m1[:, nm:]
    s21 = B21 @ m2[:, :nm]
    s22 = B22 + B21 @ m2[:, nm:]
    return s11, s12, s21, s22


def _propagation(X):
    """S-matrix of free modal propagation through one layer: both
    directions pick up the (decaying) factor X."""
    nm = X.shape[0]
    z = np.zeros((nm, nm), complex)
    return z, np.diag(X), np.diag(X), z


RcwaResult = namedtuple(
    "RcwaResult", "orders eff_r eff_t r t propagating_r propagating_t")
RcwaResult.__doc__ += """

orders: the diffraction order indices m (length 2N+1).
eff_r/eff_t: reflected/transmitted diffraction efficiencies (power
fractions of the incident wave; evanescent orders carry 0).
r/t: the complex Rayleigh amplitudes.
propagating_r/t: boolean masks of the propagating orders.
"""


def rcwa1d(period, wavelength, layers, n_in=1., n_out=1.5,
           theta_deg=0., pol="TE", orders=10):
    """Diffraction efficiencies of a 1-D surface-relief grating in
    the classical mount.

    period, wavelength and layer thicknesses share one length unit.
    `layers` is a sequence of Layer (incidence side first); an empty
    sequence gives the bare n_in/n_out interface (Fresnel).  The
    grating equation for the returned order m reads
    n_out sin(theta_m) = n_in sin(theta) + m wavelength/period.

    Returns an RcwaResult; for lossless stacks
    eff_r.sum() + eff_t.sum() == 1 to numerical precision.
    """
    if pol not in ("TE", "TM"):
        raise ValueError("pol must be 'TE' or 'TM'")
    lam = wavelength/float(period)  # work in units of the period
    n1 = complex(n_in)
    n3 = complex(n_out)
    theta = np.deg2rad(theta_deg)
    N = int(orders)
    m = np.arange(-N, N + 1)
    nm = 2*N + 1
    i0 = N  # index of order 0
    alpha = n1.real*np.sin(theta) + m*lam
    kz1 = _kz(n1, alpha)
    kz3 = _kz(n3, alpha)
    Kx = np.diag(alpha.astype(complex))
    if pol == "TE":
        z1 = kz1
        z3 = kz3
    else:
        z1 = kz1/n1**2
        z3 = kz3/n3**2

    # modal bases of the semi-infinite covers: plane waves, so W = I
    # and V = diag(q0) with q0 = -i kz -- the SAME branch convention
    # as the layer eigenmodes (Re q0 >= 0): propagating orders get
    # q0 = -i kz (forward phase exp(+i k0 kz z)), evanescent ones
    # q0 = +kappa (decaying).  Using +i kz here flips the evanescent
    # branch to -kappa, and the interface (P+Q) then cancels row-wise
    # against matched layer modes (cond ~ 1e16 at N = 40) -- the ETM
    # singularity reborn at the interface.
    eye = np.eye(nm, dtype=complex)
    w_prev, v_prev = eye, -1j*np.diag(z1)
    zero = np.zeros((nm, nm), complex)
    S = zero, eye.copy(), eye.copy(), zero.copy()  # pass-through
    for lay in layers:
        eps_h, rec_h = _eps_fourier(lay.widths, lay.indices, N)
        E = _toeplitz(eps_h, N)
        if pol == "TE":
            A = Kx @ Kx - E
        else:
            E_rli = np.linalg.inv(_toeplitz(rec_h, N))
            A = E_rli @ (Kx @ np.linalg.inv(E) @ Kx - eye)
        q, W = _modal(A)
        if pol == "TE":
            V = W*q[None, :]
        else:
            V = _toeplitz(rec_h, N) @ (W*q[None, :])
        X = np.exp(-q*2*np.pi*lay.thickness/wavelength)
        S = _star(S, _interface(w_prev, v_prev, W, V))
        S = _star(S, _propagation(X))
        w_prev, v_prev = W, V
    S = _star(S, _interface(w_prev, v_prev, eye, -1j*np.diag(z3)))

    delta = np.zeros(nm, complex)
    delta[i0] = 1.
    r = S[0] @ delta
    t = S[2] @ delta

    denom = z1[i0].real
    eff_r = np.abs(r)**2*z1.real/denom
    eff_t = np.abs(t)**2*z3.real/denom
    return RcwaResult(
        orders=m, eff_r=eff_r, eff_t=eff_t, r=r, t=t,
        propagating_r=kz1.imag == 0, propagating_t=kz3.imag == 0)


RcwaConicalResult = namedtuple(
    "RcwaConicalResult",
    "orders eff_r eff_t r_s r_p t_s t_p propagating_r propagating_t")
RcwaConicalResult.__doc__ += """

orders: the diffraction order indices m (length 2N+1).
eff_r/eff_t: total (s + p) reflected/transmitted efficiencies.
r_s/r_p/t_s/t_p: complex Rayleigh amplitudes in each order's own
s/p basis (s = z-hat x k_t; unit-|E| normalization).
propagating_r/t: boolean masks of the propagating orders.
"""


def _cover_modal(n, alpha, beta, kz):
    """s/p modal matrices of a homogeneous half-space for the
    full-vector (conical) formulation.

    Per order, the transverse E patterns are the s and p unit
    polarizations (s = z-hat x k_t-hat; p scaled to unit FULL |E|, so
    its transverse part is kz/n) and V = F^-1 W Q carries the matching
    tangential H (with q = -i kz, the same decaying-branch convention
    as `_modal`).  Closed forms (derivation: invert the per-order 2x2
    F block):

        w_s = (-sin f, cos f)         v_s = i kz (cos f, sin f)
        w_p = kz/n (cos f, sin f)     v_p = -i n (-sin f, cos f)

    with f = atan2(beta, alpha_m).  At a Wood anomaly (kz = 0) the
    vanishing w_p/v_s columns are harmless: the joint interface solve
    keeps the complementary continuity row, exactly like the classical
    path.
    """
    nm = alpha.size
    f = np.arctan2(beta, alpha)
    cf, sf = np.cos(f), np.sin(f)
    W = np.zeros((2*nm, 2*nm), complex)
    V = np.zeros((2*nm, 2*nm), complex)
    j = np.arange(nm)
    # s columns (0..nm-1)
    W[j, j] = -sf
    W[nm + j, j] = cf
    V[j, j] = 1j*kz*cf
    V[nm + j, j] = 1j*kz*sf
    # p columns (nm..2nm-1)
    W[j, nm + j] = kz/n*cf
    W[nm + j, nm + j] = kz/n*sf
    V[j, nm + j] = 1j*n*sf
    V[nm + j, nm + j] = -1j*n*cf
    return W, V


def rcwa1d_conical(period, wavelength, layers, n_in=1., n_out=1.5,
                   theta_deg=0., phi_deg=0., pol="TE", orders=10):
    """Diffraction efficiencies of a 1-D grating in the CONICAL
    (off-plane) mount: the incidence plane is rotated by `phi_deg`
    about z from the grating vector, so the wavevector has a conserved
    component along the grooves and s/p polarizations couple.

    Full-vector formulation: transverse fields e = (Ex, Ey),
    h = (Hx, Hy) obey e' = i F h, h' = i G e per z-slice (normalized
    z' = k0 z) with, for an x-periodic profile (Ky = beta I, Li's
    inverse rule on the eps*Ex product, Laurent on eps*Ey and the
    continuous-Ez elimination),

        F = [[Kx E^-1 Ky,      I - Kx E^-1 Kx],
             [Ky E^-1 Ky - I,  -Ky E^-1 Kx  ]]
        G = [[-Kx Ky,          Kx^2 - E     ],
             [Etilde - Ky^2,   Ky Kx        ]]

    so the layer modes are eigenvectors of M = -(F G) (which reduces
    block-diagonally to the classical TE matrix Kx^2 - E and the
    transpose-companion of the classical TM matrix at phi = 0).  The
    same Redheffer S-matrix recursion composes the stack on 2x-size
    blocks; covers use per-order s/p bases.

    pol: "TE" (s, E perpendicular to the incidence plane), "TM" (p),
    or a Jones pair (Es, Ep) -- normalized internally.  For order 0
    the incidence plane contains k_in and z, so TE/TM carry their
    conventional meaning regardless of azimuth.

    Returns an RcwaConicalResult; for lossless stacks
    eff_r.sum() + eff_t.sum() == 1 to numerical precision.  With
    phi_deg = 0 this matches rcwa1d (cross-pinned in the tests); the
    classical path remains the faster choice there (half-size
    eigenproblems).
    """
    jones = _jones(pol)
    lam = wavelength/float(period)
    n1 = complex(n_in)
    theta = np.deg2rad(theta_deg)
    phi = np.deg2rad(phi_deg)
    N = int(orders)
    m = np.arange(-N, N + 1)
    nm = 2*N + 1
    alpha = n1.real*np.sin(theta)*np.cos(phi) + m*lam
    beta = np.full(nm, n1.real*np.sin(theta)*np.sin(phi))
    Kx = np.diag(alpha.astype(complex))
    Ky = np.diag(beta.astype(complex))

    def layer_fg(lay):
        eps_h, rec_h = _eps_fourier(lay.widths, lay.indices, N)
        E = _toeplitz(eps_h, N)
        Et = np.linalg.inv(_toeplitz(rec_h, N))
        return _vector_fg(Kx, Ky, np.linalg.inv(E), Et, E)

    r, t, eff_r, eff_t, kz1, kz3 = _vector_stack(
        alpha, beta, n1, complex(n_out), layers, layer_fg,
        wavelength, jones, N)
    return RcwaConicalResult(
        orders=m, eff_r=eff_r, eff_t=eff_t,
        r_s=r[:nm], r_p=r[nm:], t_s=t[:nm], t_p=t[nm:],
        propagating_r=kz1.imag == 0, propagating_t=kz3.imag == 0)


def _jones(pol):
    if isinstance(pol, str):
        if pol not in ("TE", "TM"):
            raise ValueError("pol must be 'TE', 'TM' or (Es, Ep)")
        return (1., 0.) if pol == "TE" else (0., 1.)
    jones = complex(pol[0]), complex(pol[1])
    s = np.sqrt(abs(jones[0])**2 + abs(jones[1])**2)
    if s == 0:
        raise ValueError("zero polarization vector")
    return jones[0]/s, jones[1]/s


def _vector_fg(Kx, Ky, Ei, Exx, Eyy):
    """The transverse-field coupling matrices of one layer:
    e' = i F h, h' = i G e with e = (Ex, Ey), h = (Hx, Hy).  Ei is the
    (Laurent-factorized) inverse permittivity operator from the Ez
    elimination; Exx/Eyy multiply Ex/Ey and carry the discontinuity-
    aware factorization (inverse rule along the axis the component is
    normal to)."""
    eye = np.eye(Kx.shape[0], dtype=complex)
    F = np.block([[Kx @ Ei @ Ky, eye - Kx @ Ei @ Kx],
                  [Ky @ Ei @ Ky - eye, -Ky @ Ei @ Kx]])
    G = np.block([[-Kx @ Ky, Kx @ Kx - Eyy],
                  [Exx - Ky @ Ky, Ky @ Kx]])
    return F, G


def _vector_stack(alpha, beta, n1, n3, layers, layer_fg, wavelength,
                  jones, i0):
    """Run the full-vector S-matrix recursion over a layer stack:
    covers at n1/n3 with s/p modal bases over the (flattened) order
    set (alpha, beta), one (F, G) pair per layer from layer_fg.
    Returns (r, t, eff_r, eff_t, kz1, kz3); i0 indexes the incident
    order."""
    nm = alpha.size
    kt = np.hypot(alpha, beta)
    kz1 = _kz(n1, kt)
    kz3 = _kz(n3, kt)
    eye2 = np.eye(2*nm, dtype=complex)
    zero2 = np.zeros((2*nm, 2*nm), complex)
    w_prev, v_prev = _cover_modal(n1, alpha, beta, kz1)
    S = zero2, eye2.copy(), eye2.copy(), zero2.copy()
    for lay in layers:
        F, G = layer_fg(lay)
        q, W = _modal(-(F @ G))
        V = np.linalg.solve(F, W*q[None, :])
        X = np.exp(-q*2*np.pi*lay.thickness/wavelength)
        S = _star(S, _interface(w_prev, v_prev, W, V))
        S = _star(S, _propagation(X))
        w_prev, v_prev = W, V
    W3, V3 = _cover_modal(n3, alpha, beta, kz3)
    S = _star(S, _interface(w_prev, v_prev, W3, V3))

    delta = np.zeros(2*nm, complex)
    delta[i0] = jones[0]
    delta[nm + i0] = jones[1]
    r = S[0] @ delta
    t = S[2] @ delta

    denom = kz1[i0].real
    # flux weights per unit-|E| amplitude: Re kz (s), Re(kz nbar/n) (p)
    eff_r = (np.abs(r[:nm])**2*kz1.real
             + np.abs(r[nm:])**2*(kz1*np.conj(n1)/n1).real)/denom
    eff_t = (np.abs(t[:nm])**2*kz3.real
             + np.abs(t[nm:])**2*(kz3*np.conj(n3)/n3).real)/denom
    return r, t, eff_r, eff_t, kz1, kz3


#: one crossed-grating slice: thickness and a 2-D pixel grid of
#: indices -- widths_x/widths_y are cell fractions of each period
#: summing to 1, indices[i, j] the (possibly complex) refractive
#: index of cell (i, j)
Layer2 = namedtuple("Layer2", "thickness widths_x widths_y indices")


def crossed_layer(thickness, widths_x, widths_y, indices):
    """A doubly-periodic (crossed) grating slice from a rectangular
    pixel grid."""
    widths_x = tuple(float(w) for w in widths_x)
    widths_y = tuple(float(w) for w in widths_y)
    indices = np.asarray(indices, complex)
    if indices.shape != (len(widths_x), len(widths_y)):
        raise ValueError("indices must be (len(widths_x), "
                         "len(widths_y))")
    for w in (widths_x, widths_y):
        if abs(sum(w) - 1.) > 1e-9:
            raise ValueError("cell widths must sum to 1")
    return Layer2(float(thickness), widths_x, widths_y, indices)


def pillar_layer(thickness, fill_x, fill_y, n_pillar, n_bg):
    """A rectangular-pillar (or hole, swap the indices) slice:
    fill_x x fill_y of the unit cell at n_pillar, the rest at n_bg."""
    for f in (fill_x, fill_y):
        if not 0. < f < 1.:
            raise ValueError("fill fractions must be in (0, 1)")
    idx = np.full((2, 2), complex(n_bg))
    idx[0, 0] = n_pillar
    return crossed_layer(thickness, (fill_x, 1. - fill_x),
                         (fill_y, 1. - fill_y), idx)


def disk_layer(thickness, fill, n_disk, n_bg, slices=12):
    """A circular pillar (or hole) slice: a disk of diameter
    fill * period centered in the unit cell at n_disk, the rest at
    n_bg, staircased onto the tensor-product cell grid the 2-D Li
    factorization needs.

    The disk is cut into `slices` equal-height y-rows; each row's
    x-extent is the chord evaluated at the row's AREA CENTROID (exact
    row area, so the fill factor -- which drives the effective-medium
    response -- converges as O(1/slices^2) while the boundary
    staircase itself is the usual O(1/slices)).  The shared x-grid is
    the union of all chord breakpoints, so each row is represented
    EXACTLY on the grid -- the only approximation is the staircase.
    Non-rectangular profiles beyond staircasing (normal-vector-field
    factorization) are out of scope; convergence in `slices` is
    pinned in tests/test_rcwa.py."""
    if not 0. < fill < 1.:
        raise ValueError("fill must be in (0, 1)")
    if slices < 2:
        raise ValueError("need at least 2 slices")
    r = fill/2.
    # equal-height rows across the disk; chord half-width from the
    # exact row area: integral of the chord over the row / height
    edges = np.linspace(-r, r, slices + 1)

    def _area(a, b):
        # integral of 2 sqrt(r^2 - y^2) dy from a to b
        def f(y):
            y = np.clip(y, -r, r)
            return y*np.sqrt(max(r*r - y*y, 0.)) \
                + r*r*np.arcsin(np.clip(y/r, -1., 1.))
        return f(b) - f(a)

    half = np.array([
        .5*_area(a, b)/(b - a) for a, b in zip(edges[:-1], edges[1:])])
    # shared x-grid: the union of all rows' chord breakpoints
    cuts = np.unique(np.concatenate(
        [[0.], .5 - half, .5 + half, [1.]]))
    widths_x = np.diff(cuts)
    xc = .5*(cuts[:-1] + cuts[1:])
    # y-rows: background margins + the disk rows
    ylo = .5 + edges[:-1]
    yhi = .5 + edges[1:]
    widths_y = np.concatenate([[ylo[0]], yhi - ylo, [1. - yhi[-1]]])
    idx = np.full((widths_x.size, widths_y.size), complex(n_bg))
    for j, h in enumerate(half):
        inside = np.abs(xc - .5) < h
        idx[inside, j + 1] = n_disk
    return crossed_layer(thickness, widths_x, widths_y, idx)


def _indicator_fourier(widths, order):
    """Fourier coefficients (h = -2N..2N) of each cell's indicator
    function over one period: shape (ncells, 4*order + 1)."""
    widths = np.asarray(widths, float)
    x = np.concatenate([[0.], np.cumsum(widths)])
    h = np.arange(-2*order, 2*order + 1)
    out = np.zeros((widths.size, h.size), complex)
    nz = h != 0
    e = np.exp(-2j*np.pi*np.outer(h[nz], x))
    out[:, nz] = ((e[:, 1:] - e[:, :-1])
                  / (-2j*np.pi*h[nz])[:, None]).T
    out[:, ~nz] = widths[:, None]
    return out


def _crossed_operators(lay, Nx, Ny):
    """The three permittivity operators of a pixel-grid layer on the
    flattened (mx-major) order set, with Li's 2-D factorization rules
    (JOSA A 14, 2758 (1997)) for rectangular profiles:

    - E2  (for the Ez elimination; Ez is tangential to every vertical
      wall, so plain 2-D Laurent),
    - Exx (multiplies Ex: inverse rule along x, Laurent along y),
    - Eyy (multiplies Ey: inverse rule along y, Laurent along x).

    For a y-uniform profile these reduce exactly to the 1-D operators
    (E, Etilde) tensored with the y identity.
    """
    eps = np.asarray(lay.indices, complex)**2
    cx = _indicator_fourier(lay.widths_x, Nx)
    cy = _indicator_fourier(lay.widths_y, Ny)
    nmx, nmy = 2*Nx + 1, 2*Ny + 1
    mx = np.arange(nmx)
    my = np.arange(nmy)
    dmx = mx[:, None] - mx[None, :] + 2*Nx
    dmy = my[:, None] - my[None, :] + 2*Ny

    def block2(M):
        # M[hx, hy] -> operator [(mx,my),(mx',my')] (x-major flatten)
        E = M[dmx[:, None, :, None], dmy[None, :, None, :]]
        return E.reshape(nmx*nmy, nmx*nmy)

    E2 = block2(np.einsum("ia,ij,jb->ab", cx, eps, cy))
    Exx = np.zeros((nmx*nmy, nmx*nmy), complex)
    for j in range(eps.shape[1]):
        rx = (1./eps[:, j]) @ cx
        A = np.linalg.inv(_toeplitz(rx, Nx))
        Exx += np.kron(A, _toeplitz(cy[j], Ny))
    Eyy = np.zeros((nmx*nmy, nmx*nmy), complex)
    for i in range(eps.shape[0]):
        ry = (1./eps[i, :]) @ cy
        B = np.linalg.inv(_toeplitz(ry, Ny))
        Eyy += np.kron(_toeplitz(cx[i], Nx), B)
    return E2, Exx, Eyy


Rcwa2dResult = namedtuple(
    "Rcwa2dResult",
    "orders_x orders_y eff_r eff_t r_s r_p t_s t_p "
    "propagating_r propagating_t")
Rcwa2dResult.__doc__ += """

orders_x/orders_y: flattened (mx, my) order indices (length
(2Nx+1)(2Ny+1), mx-major).
eff_r/eff_t: total (s + p) efficiencies per flattened order.
r_s/r_p/t_s/t_p: complex Rayleigh amplitudes in each order's s/p
basis.  propagating_r/t: propagating-order masks.
"""


def rcwa2d(period_x, period_y, wavelength, layers, n_in=1.,
           n_out=1.5, theta_deg=0., phi_deg=0., pol="TE",
           orders_x=5, orders_y=5):
    """Diffraction efficiencies of a crossed (doubly-periodic)
    grating: pixel-grid slices (`crossed_layer`/`pillar_layer`)
    periodic in x and y with independent periods.

    The order (mx, my) leaves with transverse wavevector
    (alpha0 + mx lambda/period_x, beta0 + my lambda/period_y); the
    eigenproblem runs on the flattened order set with Li's 2-D
    factorization (see _crossed_operators), the same full-vector
    S-matrix recursion as the conical mount, and s/p cover bases.
    pol as in rcwa1d_conical.  Cost: one dense complex eig of size
    2(2Nx+1)(2Ny+1) per layer -- keep orders ~<= 7 per axis.

    For lossless stacks eff_r.sum() + eff_t.sum() == 1; a y-uniform
    pixel grid reproduces rcwa1d_conical exactly (tests pin both).
    """
    jones = _jones(pol)
    n1 = complex(n_in)
    theta = np.deg2rad(theta_deg)
    phi = np.deg2rad(phi_deg)
    Nx, Ny = int(orders_x), int(orders_y)
    mx = np.arange(-Nx, Nx + 1)
    my = np.arange(-Ny, Ny + 1)
    nmy = 2*Ny + 1
    alpha = (n1.real*np.sin(theta)*np.cos(phi)
             + mx*wavelength/float(period_x))
    beta = (n1.real*np.sin(theta)*np.sin(phi)
            + my*wavelength/float(period_y))
    alpha_f = np.repeat(alpha, nmy)
    beta_f = np.tile(beta, 2*Nx + 1)
    Kx = np.diag(alpha_f.astype(complex))
    Ky = np.diag(beta_f.astype(complex))

    def layer_fg(lay):
        E2, Exx, Eyy = _crossed_operators(lay, Nx, Ny)
        return _vector_fg(Kx, Ky, np.linalg.inv(E2), Exx, Eyy)

    i0 = Nx*nmy + Ny
    r, t, eff_r, eff_t, kz1, kz3 = _vector_stack(
        alpha_f, beta_f, n1, complex(n_out), layers, layer_fg,
        wavelength, jones, i0)
    nm = alpha_f.size
    return Rcwa2dResult(
        orders_x=np.repeat(mx, nmy), orders_y=np.tile(my, 2*Nx + 1),
        eff_r=eff_r, eff_t=eff_t,
        r_s=r[:nm], r_p=r[nm:], t_s=t[:nm], t_p=t[nm:],
        propagating_r=kz1.imag == 0, propagating_t=kz3.imag == 0)


def grating_order_weights(grating, wavelengths, orders, n_in=1.,
                          n_out=None, incidence_deg=0., scale=1e-3,
                          nslices=16, truncation=None, pol="avg",
                          reflection=None, azimuth_deg=0.):
    """RCWA efficiency table of a blazed `Grating` element: the
    rigorous drop-in for gratings.order_weights (same (len(orders),
    len(wavelengths)) shape, same argument conventions) valid below
    the d >> lambda scalar regime.

    The element's blaze_deg and grating_frequency define a sawtooth
    of period d = 1/|frequency| (system units; `scale` meters per
    unit) and depth d tan(blaze); it is staircase-approximated with
    `nslices` lamellar slices between media n_in and n_out (n_out
    defaults to the element material's index at the mid wavelength,
    or 1.5).  Orders are counted along the blaze direction, matching
    the scalar model's positive blaze order m_b.  pol: "TE", "TM" or
    "avg" (unpolarized).  reflection (default: material.mirror) reads
    the reflected instead of the transmitted efficiencies -- give a
    complex n_out for a real metal.  truncation defaults to
    max(12, 2 + ceil(2 d/lambda_min)) Fourier orders per side.
    azimuth_deg != 0 rotates the incidence plane off the grating
    vector (conical/off-plane mount, e.g. echelle cross-dispersers)
    and routes through the full-vector solver `rcwa1d_conical`.
    """
    if getattr(grating, "blaze_deg", None) is None:
        raise ValueError("grating has no blaze angle: RCWA needs the "
                         "groove profile (set blaze_deg)")
    wavelengths = np.atleast_1d(np.asarray(wavelengths, float))
    orders = np.atleast_1d(np.asarray(orders, int))
    d = scale/abs(grating.grating_frequency)  # period, meters
    depth = d*np.tan(np.deg2rad(grating.blaze_deg))
    mat = getattr(grating, "material", None)
    if reflection is None:
        reflection = bool(mat is not None
                          and getattr(mat, "mirror", False))
    if n_out is None:
        if mat is not None and getattr(mat, "solid", False):
            n_out = complex(mat.refractive_index(wavelengths.mean()))
        elif reflection:
            n_out = 1.0 + 6.5j  # aluminum-like visible stand-in
        else:
            n_out = 1.5
    pols = ("TE", "TM") if pol == "avg" else (pol,)
    out = np.zeros((orders.size, wavelengths.size))
    layers = blazed_layers(depth, n_out, n_in, nslices=nslices)
    for b, lam in enumerate(wavelengths):
        N = (truncation if truncation is not None
             else max(12, 2 + int(np.ceil(2.*d/lam))))
        for p in pols:
            if azimuth_deg:
                res = rcwa1d_conical(
                    d, lam, layers, n_in=n_in, n_out=n_out,
                    theta_deg=incidence_deg, phi_deg=azimuth_deg,
                    pol=p, orders=N)
            else:
                res = rcwa1d(d, lam, layers, n_in=n_in, n_out=n_out,
                             theta_deg=incidence_deg, pol=p, orders=N)
            eff = res.eff_r if reflection else res.eff_t
            # blazed_layers blazes transmission into its order -m
            # (thick glass at x = 0) but reflection into +m (the
            # surface phase flips sign); re-index so positive
            # requested orders count along the blaze direction
            sgn = 1 if reflection else -1
            for i, m in enumerate(orders):
                j = np.flatnonzero(res.orders == sgn*int(m))
                if j.size:
                    out[i, b] += eff[j[0]]/len(pols)
    return out
