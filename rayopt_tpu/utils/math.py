"""Small host-side math helpers (slope/sine conversions, ray-local frames).

Behavioral parity with the reference utilities in
/root/reference/rayopt/utils.py:42-114 (tanarcsin, sinarctan, norm,
normalize, sagittal_meridional).  These run on the host (NumPy); the
device-side engines inline the same formulas in jnp (see rayopt_tpu.ops).
"""

import numpy as np


def tanarcsin(u, v=None):
    """Convert direction sines to slopes, tan(arcsin(u)).

    If ``u`` has three columns it is taken as a unit direction vector and
    the slope is ``u[:2]/u[2]`` (reference utils.py:42).
    """
    u = np.asanyarray(u)
    if u.ndim == 2 and u.shape[1] == 3:
        u1 = u[:, :2]/u[:, 2:]
        if v is not None:
            return u1, np.sign(u[:, 2])
        return u1
    u2 = np.square(u)
    if u2.ndim == 2:
        u2 = (u2[:, 0] + u2[:, 1])[:, None]
    u1 = u/np.sqrt(1 - u2)
    if v is not None:
        return u1, np.sign(v)
    return u1


def sinarctan(u, v=None):
    """Convert slopes to direction sines, sin(arctan(u)).

    (reference utils.py:61)"""
    u = np.asanyarray(u)
    u2 = np.square(u)
    if u2.ndim == 2:
        if u2.shape[1] >= 3:
            v = u[:, 3]
            u, u2 = u[:, :2], u2[:, :2]
        u2 = u2.sum(1)[:, None]
    u2 = 1/np.sqrt(1 + u2)
    u1 = u*u2
    if v is not None:
        u1 = np.concatenate((u1, np.sign(v)[:, None]*u2), axis=1)
    return u1


def sfloat(a):
    try:
        return float(a)
    except (ValueError, TypeError):
        return None


def sint(a):
    try:
        return int(a)
    except (ValueError, TypeError):
        return None


def normalize_z(u):
    """Fill the z component such that u is a unit forward vector."""
    u[..., 2] = np.sqrt(1 - np.square(u[..., :2]).sum(-1))


def norm(u):
    return np.sqrt(np.square(u).sum(-1))[..., None]


def normalize(u):
    """Normalize in place."""
    u /= norm(u)


def sagittal_meridional(u, z):
    """Sagittal and meridional unit vectors of the ray-local frame.

    s = u x z (unit), m = u x s (unit); axial rays fall back to (1, 0, 0)
    (reference utils.py:107)."""
    s = np.cross(u, z)
    axial = np.all(s == 0, axis=-1)[..., None]
    s = np.where(axial, (1., 0, 0), s)
    m = np.cross(u, s)
    normalize(s)
    normalize(m)
    return s, m
