"""Forbes Q-type aspheric bases (host-side conversion utilities).

Forbes' Qcon basis (G. W. Forbes, "Shape specification for axially
symmetric optical surfaces", Opt. Express 15, 5218 (2007)) expresses
the conic departure as

    delta z(u) = u^4 * sum_m a_m Qcon_m(u^2),    u = r / norm_radius,

with Qcon_m(x) = P_m^{(0,4)}(2x - 1) the shifted Jacobi polynomials:
orthogonal over the aperture so truncating/fitting coefficients is
numerically benign, unlike raw power series whose terms cancel
against each other at high order.

Each Qcon surface is EXACTLY a finite even power series (degree
m + 2 in r^2), so the conversion below lowers Q coefficients onto
the engines' native `aspherics` vocabulary with no approximation --
every trace engine (scan, specialized XLA, Pallas, df32, poly) and
the Seidel/paraxial machinery handle Qcon surfaces for free.

The slope-orthogonal Qbfs basis is NOT implemented: its
normalization constants come from a separate orthogonalization
construction that we cannot verify against a trusted source in this
environment, and a silently wrong basis is worse than none.
"""

import numpy as np

__all__ = ["qcon_eval", "qcon_to_even_aspherics"]


def _jacobi04_xpoly(mmax):
    """Coefficient rows (in x = u^2, ascending powers) of
    P_m^{(0,4)}(2x - 1) for m = 0..mmax, via the standard Jacobi
    three-term recurrence evaluated on polynomial coefficients."""
    P = np.polynomial.Polynomial
    t = P([-1., 2.])  # t = 2x - 1
    a, b = 0., 4.
    polys = [P([1.])]
    if mmax >= 1:
        polys.append((a + b + 2)/2.*t + (a - b)/2.)
    for n in range(2, mmax + 1):
        c1 = 2*n*(n + a + b)*(2*n + a + b - 2)
        c2 = (2*n + a + b - 1)*(a*a - b*b)
        c3 = (2*n + a + b - 1)*(2*n + a + b)*(2*n + a + b - 2)
        c4 = 2*(n + a - 1)*(n + b - 1)*(2*n + a + b)
        polys.append(((c2 + c3*t)*polys[n - 1] - c4*polys[n - 2])/c1)
    return [p.coef for p in polys]


def qcon_eval(coefficients, u2):
    """Conic departure sum(a_m Qcon_m(u2)) * u2**2 at normalized
    radius-squared u2 (NumPy, host side)."""
    coefficients = np.asarray(coefficients, float)
    u2 = np.asarray(u2, float)
    if not coefficients.size:
        return np.zeros_like(u2)
    rows = _jacobi04_xpoly(coefficients.size - 1)
    out = np.zeros_like(u2)
    for a_m, row in zip(coefficients, rows):
        out = out + a_m*np.polynomial.polynomial.polyval(u2, row)
    return out*u2*u2


def qcon_to_even_aspherics(coefficients, norm_radius=1.):
    """Expand the Qcon departure into the engines' even-asphere
    coefficients: returns the `aspherics` list whose element i
    multiplies r**(2i + 2).  Exact (each Qcon_m is a finite
    polynomial).  The departure starts at r^4, so element 0 (the r^2
    term) stays 0 and the paraxial power is untouched -- the defining
    property of the conic-departure basis."""
    coefficients = np.asarray(coefficients, float)
    if not coefficients.size:
        return []
    rows = _jacobi04_xpoly(coefficients.size - 1)
    mmax = coefficients.size - 1
    # u^4 * x^j -> r^(2(j+2)) / R^(2(j+2)) -> aspherics[j + 1]
    out = np.zeros(mmax + 2)
    R = float(norm_radius)
    for a_m, row in zip(coefficients, rows):
        for j, c in enumerate(row):
            out[j + 1] += a_m*c/R**(2*(j + 2))
    return list(out)
