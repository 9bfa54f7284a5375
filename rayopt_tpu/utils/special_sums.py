"""Directional reductions of a 2-D grid: skewed-axis, radial, azimuthal.

Used by the encircled-energy panel in :mod:`rayopt_tpu.analysis` (parity
target: reference special_sums.py:24-263).  Behavioral contract:

* ``angle_sum(m, a)`` collapses ``m`` along lines at angle ``a`` (measured
  from the first axis, with the ``[0, 0]`` pixel treated as the lower-left
  corner), so ``angle_sum(m, 0) == m.sum(0)`` and
  ``angle_sum(m, pi/2) == m.sum(1)``.
* ``polar_sum(m, c, "azimuthal")`` collapses over angle, binning by radius
  from ``c``; ``polar_sum(m, c, "radial")`` collapses over radius, binning
  by azimuth (``2*pi/binsize`` bins, with the +pi seam folded into bin 0).
* Both conserve the total: ``out.sum() == m.sum()`` always (no
  interpolation, every pixel lands in exactly one bin).

The implementation here is scatter-add over an integer bin image: build
the per-pixel scalar coordinate, shift it to start at zero, quantize, and
accumulate with ``np.add.at``.
"""

import numpy as np


def _scatter(bins, weights, length):
    """Sum `weights` into `length` buckets indexed by `bins`."""
    out = np.zeros(length, dtype=float)
    np.add.at(out, bins.ravel(), np.asarray(weights, dtype=float).ravel())
    return out


def _grid_offsets(shape, origin=(0., 0.)):
    """Per-pixel (row, col) offsets from `origin`, broadcastable."""
    dy = np.arange(shape[0], dtype=float)[:, None] - origin[0]
    dx = np.arange(shape[1], dtype=float)[None, :] - origin[1]
    return dy, dx


def angle_sum(m, angle, aspect=1., binsize=None):
    """Collapse a 2-D array along lines at `angle`.

    `aspect` scales the second axis (column pitch / row pitch); `binsize`
    is the output pitch along the line-normal, defaulting to the larger
    of the two projected input pitches.  Bins use round-half-up on the
    line-normal coordinate, anchored so the smallest coordinate maps to
    bin 0.  The total is conserved exactly.

    >>> m = np.arange(9.).reshape((3, 3))
    >>> bool(np.all(angle_sum(m, 0) == m.sum(axis=0)))
    True
    >>> bool(np.all(angle_sum(m, np.pi/2) == m.sum(axis=1)))
    True
    >>> bool(np.all(angle_sum(m, np.pi) == m.sum(axis=0)[::-1]))
    True
    >>> bool(np.all(angle_sum(m, np.pi/4) == [0, 4, 12, 12, 8]))
    True
    >>> bool(np.all(angle_sum(m, 3*np.pi/4) == [2, 6, 12, 10, 6]))
    True
    >>> bool(angle_sum(m, .3).sum() == m.sum())
    True
    """
    m = np.atleast_2d(m)
    nrow = m.shape[0]
    c, s = np.cos(angle) * aspect, np.sin(angle)
    if binsize is None:
        binsize = max(abs(c), abs(s))
    # Line-normal coordinate.  The angle convention puts [0, 0] at the
    # lower left, so rows count downward from nrow-1 instead of flipping m.
    dy, dx = _grid_offsets(m.shape)
    t = (c * dx - s * (nrow - 1. - dy)) / binsize
    t -= t.min()  # t is affine in (dy, dx): the grid min is the true min
    bins = np.floor(t + .5).astype(np.intp)
    return _scatter(bins, m, bins.max() + 1)


def polar_sum(m, center, direction, aspect=1., binsize=None):
    """Collapse a 2-D array about `center`, azimuthally or radially.

    ``direction="azimuthal"`` sums over angle and bins by radius
    (default binsize ``min(1, aspect)``); ``direction="radial"`` sums
    over radius and bins by azimuth measured from the +column axis
    toward the -row axis (default binsize ``2*pi/100``), yielding
    ``int(2*pi/binsize)`` bins with the +pi seam wrapped into bin 0.
    Bins truncate toward zero; the total is conserved exactly.

    >>> m = np.arange(1., 10.).reshape((3, 3))
    >>> bool(polar_sum(m, (0, 0), "radial").sum() == m.sum())
    True
    >>> bool(polar_sum(m, (1, 1), "azimuthal").sum() == m.sum())
    True
    >>> polar_sum(m, (1, 1), "azimuthal", binsize=1.)
    array([ 5., 40.])
    >>> polar_sum(m, (1, 1), "radial", binsize=np.pi/4)
    array([ 4.,  1.,  2.,  3., 11.,  9.,  8.,  7.])
    """
    m = np.atleast_2d(m)
    dy, dx = _grid_offsets(m.shape, center)
    dx = dx * aspect
    if direction == "azimuthal":
        if binsize is None:
            binsize = min(1., aspect)
        bins = (np.hypot(dy, dx) / binsize).astype(np.intp)
        return _scatter(bins, m, bins.max() + 1)
    if direction == "radial":
        if binsize is None:
            binsize = 2 * np.pi / 100
        nbins = int(2 * np.pi / binsize)
        # azimuth in [0, 2*pi]; the 2*pi edge (arctan2 == +pi exactly)
        # wraps onto bin 0 via the modulo
        phi = np.arctan2(dy, dx) + np.pi
        bins = (phi / binsize).astype(np.intp) % nbins
        return _scatter(bins, m, nbins)
    raise ValueError(f"unknown direction {direction!r} "
                     "(want 'radial' or 'azimuthal')")


if __name__ == "__main__":
    import doctest
    doctest.testmod()
