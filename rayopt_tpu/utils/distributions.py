"""Pupil sampling distributions and disc quadrature rules.

Parity with reference utils.py:118-247 (pupil_distribution, gl_roots,
gr_roots, interval_to_circle): eleven sampling patterns over the unit
pupil disc including Gauss-Radau/Lobatto quadratures whose weights make
weighted spot-RMS a proper disc integral.

Host-side NumPy: these produce the static-shape ray seeds that are then
handed to the jitted trace engines.
"""

import numpy as np


def _legendre(n):
    """Legendre polynomial P_n as np.poly1d (highest power first)."""
    c = np.zeros(n + 1)
    c[n] = 1
    return np.poly1d(np.polynomial.legendre.leg2poly(c)[::-1])


def gl_roots(n):
    """Gauss-Lobatto nodes/weights on [-1, 1], -1 first, 1 last.

    (reference utils.py:203)"""
    leg = _legendre(n - 1)
    x = np.r_[-1, np.sort(leg.deriv().roots.real), 1]
    w = 2/(n*(n - 1)*leg(x)**2)
    return x, w


def gr_roots(n):
    """Gauss-Radau nodes/weights on [-1, 1], -1 first.

    (reference utils.py:214)"""
    leg = _legendre(n - 1)
    num = leg + _legendre(n)
    quot, rem = np.polydiv(num.coeffs, np.array([1., 1.]))
    x = np.r_[-1, np.sort(np.poly1d(quot).roots.real)]
    w = (1 - x)/(n*leg(x))**2
    return x, w


def interval_to_circle(x, w, p=None, a=-1., b=1.):
    """Lift a 1-D quadrature (x, w) on [a, b] to (r, phi, w) on the unit
    disc (reference utils.py:226)."""
    n = len(x)
    assert len(x) == len(w)
    r = ((x - a)/(b - a))**.5
    if p is None:
        p = len(x)
    p = np.asarray(p)
    if p.ndim == 0:
        p = np.pi*((np.arange(p) + .5)/p - .5)
    m = p.shape[0]
    if r[0] == 0.:
        rs = np.r_[r[0], np.repeat(r[1:], m)]
        ws = np.r_[w[0], np.repeat(w[1:]/m, m)]/2
        ps = np.r_[0, np.repeat(p[None, :], n - 1, 0).ravel()]
    else:
        rs = np.repeat(r, m)
        ws = np.repeat(w/m, m)/2
        ps = np.repeat(p[None, :], n, 0).ravel()
    assert np.allclose(ws.sum(), 1), ws.sum()
    return rs, ps, ws


def pupil_distribution(distribution, nrays):
    """Return (ref_index, xy, weight) for nrays in normalized pupil
    coordinates, clipped to the unit circle.

    Supported: meridional, half-meridional, sagittal, cross, tee, random,
    square, triangular, hexapolar, radau, lobatto
    (reference utils.py:118-199).
    """
    d = distribution
    n = nrays
    weight = None
    ref = 0
    if n == 1:
        xy = np.zeros((n, 2))
    elif d == "half-meridional":
        xy = np.c_[np.zeros(n), np.linspace(0, 1, n)]
    elif d == "meridional":
        n -= n % 2
        xy = np.c_[np.zeros(n + 1), np.linspace(-1, 1, n + 1)]
    elif d == "sagittal":
        n -= n % 2
        ref = n//2
        xy = np.c_[np.linspace(-1, 1, n + 1), np.zeros(n + 1)]
    elif d == "cross":
        n -= n % 4
        ref = n//4
        xy = np.concatenate([
            np.c_[np.zeros(n//2 + 1), np.linspace(-1, 1, n//2 + 1)],
            np.c_[np.linspace(-1, 1, n//2 + 1), np.zeros(n//2 + 1)],
            ])
    elif d == "tee":
        n = (n - 2)//3
        ref = 2*n + 1
        xy = np.concatenate([
            np.c_[np.zeros(2*n + 1), np.linspace(-1, 1, 2*n + 1)],
            np.c_[np.linspace(0, 1, n + 1), np.zeros(n + 1)],
            ])
    elif d == "random":
        r, phi = np.random.rand(2, n)
        xy = np.exp(2j*np.pi*phi)*np.sqrt(r)
        xy = np.c_[xy.real, xy.imag]
        xy = np.concatenate([[[0, 0]], xy])
    elif d == "square":
        n = int(np.sqrt(n*4/np.pi))
        xy = np.mgrid[-1:1:1j*n, -1:1:1j*n].reshape(2, -1)
        xy = xy[:, (xy**2).sum(0) <= 1].T
        xy = np.concatenate([[[0, 0]], xy])
    elif d == "triangular":
        n = int(np.sqrt(n*4/np.pi))
        xy = np.mgrid[-1:1:1j*n, -1:1:1j*n]
        xy[0] += (np.arange(n) % 2.)*(2./n)
        xy = xy.reshape(2, -1)
        xy = xy[:, (xy**2).sum(0) <= 1].T
        xy = np.concatenate([[[0, 0]], xy])
    elif d == "hexapolar":
        n = int(np.sqrt(n/3. - 1/12.) - 1/2.)
        rings = [np.zeros((2, 1))]
        for i in range(1, n + 1):
            a = np.linspace(0, 2*np.pi, 6*i, endpoint=False)
            rings.append([np.sin(a)*i/n, np.cos(a)*i/n])
        xy = np.concatenate(rings, axis=1).T
    elif d == "radau":
        n = int(np.sqrt(n) + 1)
        x, w = gr_roots(n)
        r, p, weight = interval_to_circle(x, w)
        xy = np.c_[r*np.cos(p), r*np.sin(p)]
    elif d == "lobatto":
        n = int(np.sqrt(n) + 1)
        x, w = gl_roots(n)
        r, p, weight = interval_to_circle(x, w)
        xy = np.c_[r*np.cos(p), r*np.sin(p)]
    else:
        raise ValueError("unknown ray distribution", d)
    return ref, xy, weight
