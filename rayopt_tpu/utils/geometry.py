"""Rotation / Euler-angle helpers.

The reference vendors the full Gohlke transformations library plus a C
accelerator (_transformations.c) but only consumes three functions
(reference elements.py:23-24): rotation_matrix, euler_matrix,
euler_from_matrix.  We implement those from first principles
(Rodrigues formula; Euler composition/extraction derived via index
arithmetic over the axis permutation -- all 24 axes conventions, both
Tait-Bryan and proper-Euler sequences, static and rotating frames).
All return 3x3 matrices.  An optional C++ accelerator with identical
semantics for the hot subset lives in rayopt_tpu/native (used when
built; these NumPy versions are the reference implementation and the
fallback).
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


_SINGLE = {0: _rx, 1: _ry, 2: _rz}
_AXIS_IDX = {"x": 0, "y": 1, "z": 2}


def _parse_axes(axes):
    """Parse an axes spec like 'sxyz'/'rzxz' into (frame, i, j, k).

    frame 'r' = rotating/intrinsic (each rotation about the already-
    rotated axes), 's' = static/extrinsic (all about the fixed lab
    axes).  k may repeat i (proper Euler, e.g. zxz) but consecutive
    axes must differ -- the 24 classic conventions.
    """
    try:
        frame = axes[0]
        i, j, k = (_AXIS_IDX[c] for c in axes[1:])
        assert frame in "rs" and i != j and j != k
    except (KeyError, AssertionError, IndexError, ValueError):
        raise ValueError("unsupported axes spec %r" % (axes,))
    return frame, i, j, k


def _perm_sign(i, j):
    """+1 if (i, j, third) is an even permutation of (0, 1, 2)."""
    return 1. if (j - i) % 3 == 1 else -1.


def euler_matrix(ai=0., aj=0., ak=0., axes="sxyz"):
    """3x3 rotation from Euler angles, any of the 24 axes conventions.

    Rotating frame 'rabc': R = Ra(ai) @ Rb(aj) @ Rc(ak) (intrinsic).
    Static frame 'sabc' applies the same axes about the fixed lab
    frame, i.e. R = Rc(ak) @ Rb(aj) @ Ra(ai) -- so e.g.
    'sxyz'(ai, aj, ak) == 'rzyx'(ak, aj, ai).
    """
    frame, i, j, k = _parse_axes(axes)
    if frame == "r":
        return _SINGLE[i](ai) @ _SINGLE[j](aj) @ _SINGLE[k](ak)
    return _SINGLE[k](ak) @ _SINGLE[j](aj) @ _SINGLE[i](ai)


def euler_from_matrix(matrix, axes="sxyz"):
    """Euler angles from a 3x3 (or homogeneous 4x4) rotation matrix:
    the inverse of euler_matrix for the same axes spec.

    Derivation (rotating frame; the static frame reduces to it by
    reversing the sequence and swapping the outer angles): with
    sigma the permutation sign of (i, j, .), expanding basis row i
    and column k/i of the product gives closed forms for each angle;
    the gimbal-locked branch (middle angle at the degenerate value)
    zeroes the last angle and absorbs it into the first.
    """
    m = np.asarray(matrix, dtype=float)[:3, :3]
    frame, i, j, k = _parse_axes(axes)
    if frame == "s":
        # sabc(a, b, c) == r(cba)(c, b, a)
        i, k = k, i
        a, b, c = euler_from_matrix(m, "r" + "xyz"[i] + "xyz"[j]
                                    + "xyz"[k])
        return c, b, a
    eps = np.finfo(float).eps*4
    sig = _perm_sign(i, j)
    if k == i:
        # proper Euler sequence Ri(a) Rj(b) Ri(c); l = third axis.
        # Row i:    m[i,i] = cb, m[i,j] = sb sc, m[i,l] = sig sb cc
        # Column i: m[j,i] = sa sb, m[l,i] = -sig ca sb
        lx = 3 - i - j
        sb = np.hypot(m[i, j], m[i, lx])
        if sb > eps:
            a = np.arctan2(m[j, i], -sig*m[lx, i])
            b = np.arctan2(sb, m[i, i])
            c = np.arctan2(m[i, j], sig*m[i, lx])
        else:
            # b in {0, pi}: only a+c (at 0) or a-c (at pi) is
            # defined; fold it into a.  At b == 0 the product is
            # Ri(a+c) (m[j,l] = -sig sin); at b == pi it is
            # Ri(a-c) Rj(pi) (m[j,l] = +sig sin)
            sgn = 1. if m[i, i] > 0 else -1.
            a = np.arctan2(-sgn*sig*m[j, lx], m[j, j])
            b = np.arctan2(sb, m[i, i])
            c = 0.
        return a, b, c
    # Tait-Bryan sequence Ri(a) Rj(b) Rk(c).
    # Row i:    m[i,i] = cb cc, m[i,j] = -sig cb sc, m[i,k] = sig sb
    # Column k: m[j,k] = -sig cb sa, m[k,k] = cb ca
    cb = np.hypot(m[i, i], m[i, j])
    if cb > eps:
        a = np.arctan2(-sig*m[j, k], m[k, k])
        b = np.arctan2(sig*m[i, k], cb)
        c = np.arctan2(-sig*m[i, j], m[i, i])
    else:
        # gimbal lock: at b = +pi/2 the product collapses to
        # Ri(a+c) Rj(pi/2), at b = -pi/2 to Ri(a-c) Rj(-pi/2); fold
        # the free combination into a (m[j,i] = sign(sb) sin d,
        # m[j,j] = cos d)
        sgn = 1. if sig*m[i, k] > 0 else -1.
        a = np.arctan2(sgn*m[j, i], m[j, j])
        b = np.arctan2(sig*m[i, k], cb)
        c = 0.
    return a, b, c
