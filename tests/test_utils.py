"""Math/utility tests (mirrors reference test_utils.py)."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.utils.math import (
    sinarctan, tanarcsin, sagittal_meridional, normalize)
from rayopt_tpu.utils.distributions import (
    pupil_distribution, gr_roots, gl_roots, interval_to_circle)
from rayopt_tpu.utils.geometry import (
    rotation_matrix, euler_matrix, euler_from_matrix)


def test_trig_identities():
    u = np.linspace(-.9, .9, 17)
    nptest.assert_allclose(sinarctan(tanarcsin(u)), u, atol=1e-14)
    nptest.assert_allclose(tanarcsin(sinarctan(u)), u, atol=1e-14)


def test_tanarcsin_direction():
    u = np.array([[.1, .2, np.sqrt(1 - .05)]])
    nptest.assert_allclose(tanarcsin(u), u[:, :2]/u[:, 2:])


def test_trig_pair_roundtrip():
    # a transverse (N, 2) pair shares one axial component
    rng = np.random.RandomState(1)
    t = rng.uniform(-.5, .5, (9, 2))
    s = sinarctan(t)
    assert s.shape == t.shape
    nptest.assert_allclose(np.square(s).sum(1),
                           np.square(t).sum(1)/(1 + np.square(t).sum(1)))
    nptest.assert_allclose(tanarcsin(s), t, atol=1e-14)


def test_sinarctan_direction_rows():
    # (N, 3) input: columns 0:2 are the slope pair, the sign of the
    # axial column propagates into the returned unit vector.  The
    # reference's branch for this read u[:, 3] and always IndexError'd
    # on a 3-column input; regression for the fixed semantics.
    t = np.array([[.1, -.2, 1.], [.3, .1, -2.], [0., 0., .5]])
    d = sinarctan(t)
    assert d.shape == (3, 3)
    nptest.assert_allclose(np.linalg.norm(d, axis=1), 1, atol=1e-14)
    nptest.assert_allclose(d[:, :2]/d[:, 2:3]*np.sign(t[:, 2:3]),
                           t[:, :2], atol=1e-14)
    nptest.assert_allclose(np.sign(d[:, 2]), np.sign(t[:, 2]))


def test_trig_sign_passthrough():
    u = np.linspace(-.8, .8, 5)
    t, sign = tanarcsin(u, v=-2.)
    nptest.assert_allclose(t, u/np.sqrt(1 - u*u), atol=1e-14)
    assert sign == -1
    d = np.array([[.1, .2, np.sqrt(1 - .05)]])
    t, sign = tanarcsin(d, v=True)
    nptest.assert_allclose(sign, [1.])
    s = sinarctan(t, v=np.array([-1.]))
    nptest.assert_allclose(s, -d*[[-1, -1, 1]], atol=1e-14)


def test_sagittal_meridional():
    rng = np.random.RandomState(0)
    u = rng.randn(10, 3)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    z = np.array([0, 0, 1.])
    s, m = sagittal_meridional(u, z)
    # orthonormal ray-local frame
    nptest.assert_allclose((s*u).sum(-1), 0, atol=1e-13)
    nptest.assert_allclose((m*u).sum(-1), 0, atol=1e-13)
    nptest.assert_allclose((s*m).sum(-1), 0, atol=1e-13)
    nptest.assert_allclose(np.linalg.norm(s, axis=-1), 1, atol=1e-13)
    nptest.assert_allclose(np.linalg.norm(m, axis=-1), 1, atol=1e-13)
    # sagittal has no z component for z-axis reference
    nptest.assert_allclose(s[:, 2], 0, atol=1e-13)


def test_axial_sagittal():
    u = np.array([[0, 0, 1.]])
    s, m = sagittal_meridional(u, np.array([0, 0, 1.]))
    nptest.assert_allclose(s, [[1, 0, 0]])


def test_radau_quadrature():
    # Gauss-Radau with n points integrates polynomials up to order 2n-2
    x, w = gr_roots(5)
    assert x[0] == -1
    nptest.assert_allclose(w.sum(), 2, rtol=1e-12)
    for k in range(2*5 - 1):
        nptest.assert_allclose((w*x**k).sum(), 2./(k + 1)*(k % 2 == 0),
                               atol=1e-12)


def test_lobatto_quadrature():
    x, w = gl_roots(6)
    assert x[0] == -1 and x[-1] == 1
    nptest.assert_allclose(w.sum(), 2, rtol=1e-12)
    for k in range(2*6 - 3):
        nptest.assert_allclose((w*x**k).sum(), 2./(k + 1)*(k % 2 == 0),
                               atol=1e-12)


def test_disc_quadrature_integrates():
    # integral of r^2 over unit disc (normalized measure) is 1/2
    x, w = gr_roots(8)
    r, p, ws = interval_to_circle(x, w)
    nptest.assert_allclose(ws.sum(), 1, rtol=1e-12)
    nptest.assert_allclose((ws*r**2).sum(), .5, rtol=1e-10)


@pytest.mark.parametrize("dist", [
    "meridional", "sagittal", "cross", "tee", "random", "square",
    "triangular", "hexapolar", "radau", "lobatto", "half-meridional"])
def test_pupil_distribution(dist):
    ref, xy, weight = pupil_distribution(dist, 32)
    assert xy.ndim == 2 and xy.shape[1] == 2
    r = np.square(xy).sum(1)
    assert (r <= 1 + 1e-9).all()
    assert 0 <= ref < xy.shape[0]
    if dist in ("sagittal", "cross", "tee", "random", "square",
                "triangular", "hexapolar", "half-meridional"):
        # for these the reference ray is the pupil center
        nptest.assert_allclose(xy[ref], 0, atol=1e-14)
    if weight is not None:
        nptest.assert_allclose(weight.sum(), 1, rtol=1e-12)


def test_rotation_matrix():
    r = rotation_matrix(.3, (0, 0, 1))
    nptest.assert_allclose(r @ [1, 0, 0],
                           [np.cos(.3), np.sin(.3), 0], atol=1e-14)
    # orthonormality for random axis
    r = rotation_matrix(1.1, (1, 2, 3.))
    nptest.assert_allclose(r @ r.T, np.eye(3), atol=1e-14)
    nptest.assert_allclose(np.linalg.det(r), 1, atol=1e-14)


@pytest.mark.parametrize("axes", ["rxyz", "sxyz"])
def test_euler_roundtrip(axes):
    rng = np.random.RandomState(42)
    for _ in range(20):
        angles = rng.uniform(-1.2, 1.2, 3)
        m = euler_matrix(*angles, axes=axes)
        back = euler_from_matrix(m, axes)
        nptest.assert_allclose(back, angles, atol=1e-12)


def test_normalize():
    u = np.random.RandomState(1).randn(5, 3)
    normalize(u)
    nptest.assert_allclose(np.linalg.norm(u, axis=-1), 1, atol=1e-13)


def test_euler_all_24_conventions_roundtrip():
    """euler_matrix/euler_from_matrix cover all 24 classic axes
    conventions (Tait-Bryan and proper-Euler, static and rotating
    frames; the reference vendors the full Gohlke library for this,
    reference transformations.py:1047-1110).  Round-trip through the
    matrix must reproduce it, including the gimbal-locked poses."""
    import itertools
    from rayopt_tpu.utils.geometry import euler_matrix, euler_from_matrix
    rng = np.random.RandomState(3)
    axes_list = ["%s%s%s%s" % (f, a, b, c) for f in "rs"
                 for a, b, c in itertools.product("xyz", repeat=3)
                 if a != b and b != c]
    assert len(axes_list) == 24
    degenerate = [0., np.pi/2, -np.pi/2, np.pi]
    for axes in axes_list:
        for t in range(40):
            ang = rng.uniform(-np.pi, np.pi, 3)
            if t % 4 == 0:
                ang[1] = degenerate[t % len(degenerate)]
            m = euler_matrix(*ang, axes=axes)
            nptest.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
            back = euler_from_matrix(m, axes)
            nptest.assert_allclose(euler_matrix(*back, axes=axes), m,
                                   atol=1e-9)
    # the two conventions consumed by the element model keep their
    # legacy closed forms
    a = euler_from_matrix(euler_matrix(.3, -.7, 1.2, "rxyz"), "rxyz")
    nptest.assert_allclose(a, (.3, -.7, 1.2), atol=1e-12)
    with pytest.raises(ValueError):
        euler_matrix(1., 2., 3., axes="sxxz")


def test_quaternion_roundtrips():
    from rayopt_tpu.utils.geometry import (
        quaternion_about_axis, quaternion_matrix,
        quaternion_from_matrix, quaternion_multiply,
        quaternion_inverse, rotation_matrix, random_quaternion)
    rng = np.random.RandomState(3)
    for _ in range(20):
        q = random_quaternion(rng)
        m = quaternion_matrix(q)
        # proper rotation
        nptest.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        nptest.assert_allclose(np.linalg.det(m), 1, atol=1e-12)
        # matrix -> quaternion -> matrix round trip
        nptest.assert_allclose(quaternion_matrix(
            quaternion_from_matrix(m)), m, atol=1e-12)
        # composition homomorphism
        p = random_quaternion(rng)
        nptest.assert_allclose(
            quaternion_matrix(quaternion_multiply(p, q)),
            quaternion_matrix(p) @ quaternion_matrix(q), atol=1e-12)
        # inverse
        nptest.assert_allclose(
            quaternion_multiply(q, quaternion_inverse(q)),
            [1, 0, 0, 0], atol=1e-12)
    # axis-angle agrees with Rodrigues
    ang, ax = 0.7, (1., -2., .5)
    nptest.assert_allclose(
        quaternion_matrix(quaternion_about_axis(ang, ax)),
        rotation_matrix(ang, ax), atol=1e-12)


def test_quaternion_euler_and_slerp():
    from rayopt_tpu.utils.geometry import (
        quaternion_from_euler, euler_from_quaternion,
        quaternion_slerp, quaternion_about_axis, quaternion_matrix,
        rotation_matrix)
    ai, aj, ak = .3, -.4, 1.2
    q = quaternion_from_euler(ai, aj, ak, "rxyz")
    nptest.assert_allclose(
        euler_from_quaternion(q, "rxyz"), (ai, aj, ak), atol=1e-12)
    # slerp endpoints and the half-angle property
    q0 = quaternion_about_axis(0., (0, 0, 1.))
    q1 = quaternion_about_axis(1., (0, 0, 1.))
    nptest.assert_allclose(quaternion_slerp(q0, q1, 0.), q0,
                           atol=1e-12)
    nptest.assert_allclose(quaternion_slerp(q0, q1, 1.), q1,
                           atol=1e-12)
    nptest.assert_allclose(
        quaternion_matrix(quaternion_slerp(q0, q1, .5)),
        rotation_matrix(.5, (0, 0, 1.)), atol=1e-12)


def test_superimposition_matrix():
    from rayopt_tpu.utils.geometry import (
        superimposition_matrix, rotation_matrix)
    rng = np.random.RandomState(4)
    v0 = rng.randn(3, 30)
    r = rotation_matrix(.8, (1., 2., 3.))
    t = np.array([[1.], [-2.], [.5]])
    for s in (1., 1.7):
        v1 = s*(r @ v0) + t
        m = superimposition_matrix(v0, v1, scale=(s != 1.))
        got = m[:3, :3] @ v0 + m[:3, 3:]
        nptest.assert_allclose(got, v1, atol=1e-10)
        nptest.assert_allclose(m[:3, :3], s*r, atol=1e-10)


def test_quadrature_scales_to_production_ray_counts():
    """Gauss-Radau/Lobatto pupil quadrature stays a valid rule at
    thousands of rays (the reference's monomial-basis root finding
    collapses past degree ~40 / ~1600 rays: weights summed to 3.05 at
    nrays=4096 and radii went NaN)."""
    import numpy as np
    from rayopt_tpu.utils.distributions import pupil_distribution
    for dist in ("radau", "lobatto"):
        for n in (1024, 4096, 16384):
            ref, xy, w = pupil_distribution(dist, n)
            assert np.isfinite(xy).all(), (dist, n)
            assert np.all(np.square(xy).sum(1) <= 1 + 1e-12)
            np.testing.assert_allclose(np.sum(w), 1., rtol=1e-9)
            assert np.all(np.asarray(w) > 0)
