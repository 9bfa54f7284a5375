"""Rotation / Euler-angle helpers.

The reference vendors the full Gohlke transformations library plus a C
accelerator (_transformations.c) but only consumes three functions
(reference elements.py:23-24): rotation_matrix, euler_matrix,
euler_from_matrix.  We implement exactly that used subset from first
principles (Rodrigues formula, intrinsic-xyz Euler composition).  All
return 3x3 matrices.  An optional C++ accelerator with identical
semantics lives in rayopt_tpu/native (used when built; these NumPy
versions are the reference implementation and the fallback).
"""

import numpy as np


def rotation_matrix(angle, direction):
    """Rotation by `angle` about the axis `direction` (Rodrigues)."""
    d = np.asarray(direction, dtype=float)[:3]
    n = np.linalg.norm(d)
    if n == 0:
        return np.eye(3)
    x, y, z = d/n
    c, s = np.cos(angle), np.sin(angle)
    k = np.array([[0., -z, y], [z, 0., -x], [-y, x, 0.]])
    outer = np.outer((x, y, z), (x, y, z))
    return c*np.eye(3) + s*k + (1 - c)*outer


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1., 0, 0], [0, c, -s], [0, s, c]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1., 0], [-s, 0, c]])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.]])


def euler_matrix(ai=0., aj=0., ak=0., axes="sxyz"):
    """3x3 rotation from Euler angles.

    'rxyz' (intrinsic/rotating frame, the convention used for element
    tilts): R = Rx(ai) @ Ry(aj) @ Rz(ak).
    'sxyz' (extrinsic/static frame): R = Rz(ak) @ Ry(aj) @ Rx(ai).
    """
    if axes == "rxyz":
        return _rx(ai) @ _ry(aj) @ _rz(ak)
    if axes == "sxyz":
        return _rz(ak) @ _ry(aj) @ _rx(ai)
    raise ValueError("unsupported axes spec %r" % axes)


def euler_from_matrix(matrix, axes="sxyz"):
    """Euler angles from a 3x3 (or homogeneous 4x4) rotation matrix.

    Inverse of euler_matrix for the same axes spec.
    """
    m = np.asarray(matrix, dtype=float)[:3, :3]
    eps = np.finfo(float).eps*4
    if axes == "rxyz":
        # m = Rx(a) Ry(b) Rz(c); m[0] = [cb*cc, -cb*sc, sb]
        cb = np.hypot(m[0, 0], m[0, 1])
        if cb > eps:
            a = np.arctan2(-m[1, 2], m[2, 2])
            b = np.arctan2(m[0, 2], cb)
            c = np.arctan2(-m[0, 1], m[0, 0])
        else:
            a = np.arctan2(m[1, 0], m[1, 1])
            b = np.arctan2(m[0, 2], cb)
            c = 0.
        return a, b, c
    if axes == "sxyz":
        # sxyz(a, b, c) == transpose-relation to rxyz(c, b, a)
        # m = Rz(c) Ry(b) Rx(a); m[:,0] and m[2] give the angles
        cb = np.hypot(m[2, 1], m[2, 2])
        if cb > eps:
            a = np.arctan2(m[2, 1], m[2, 2])
            b = np.arctan2(-m[2, 0], cb)
            c = np.arctan2(m[1, 0], m[0, 0])
        else:
            a = np.arctan2(-m[1, 2], m[1, 1])
            b = np.arctan2(-m[2, 0], cb)
            c = 0.
        return a, b, c
    raise ValueError("unsupported axes spec %r" % axes)
