"""Sum a 2D array along a rotated axis, radially, or azimuthally.

Behavioral parity with reference special_sums.py:24-263 (used for
encircled-energy curves in the PSF analysis).  Binning semantics match
the reference exactly: floor(x+.5) bins for angle_sum, int-cast bins
for polar_sum, and strict conservation of the array sum.
"""

import numpy as np


def angle_sum(m, angle, aspect=1., binsize=None):
    """Sum of a 2D array along a rotated axis.

    angle_sum(m, 0) == m.sum(axis=0); angle_sum(m, pi/2) == m.sum(axis=1)

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
    if binsize is None:
        binsize = max(abs(np.cos(angle)*aspect), abs(np.sin(angle)))
    m = m[::-1]  # angle convention: [0, 0] lower left
    i, j = np.ogrid[:m.shape[0], :m.shape[1]]
    k = (np.cos(angle)*aspect/binsize)*j - (np.sin(angle)/binsize)*i
    cx, cy = (0, 0, -1, -1), (0, -1, 0, -1)
    km = k[cx, cy].min()
    k = np.floor(k - (km - .5)).astype(int)
    return np.bincount(k.ravel(), m.ravel())


def polar_sum(m, center, direction, aspect=1., binsize=None):
    """Sum of a 2D array radially ("radial": bins over angle) or
    azimuthally ("azimuthal": bins over radius) about `center`.

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
    i, j = np.ogrid[:m.shape[0], :m.shape[1]]
    i, j = i - center[0], j - center[1]
    if direction == "azimuthal":
        k = (j**2*aspect**2 + i**2)**.5
        if binsize is None:
            binsize = min(1., aspect)
        minlength = 0
    elif direction == "radial":
        k = np.arctan2(i, j*aspect) + np.pi
        if binsize is None:
            binsize = 2*np.pi/100
        minlength = int(2*np.pi/binsize) + 1
    else:
        raise ValueError("direction needs to be 'radial' or 'azimuthal'")
    k = (k/binsize).astype(int)
    r = np.bincount(k.ravel(), m.ravel(), minlength)
    if direction == "radial":
        r[0] += r[-1]
        r = r[:-1]
    return r


if __name__ == "__main__":
    import doctest
    doctest.testmod()
