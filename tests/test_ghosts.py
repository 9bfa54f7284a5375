"""Two-reflection ghost analysis: unfolded-system real-ray trace vs
an independent reduced-angle ABCD oracle, plus structural checks."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.elements import Spheroid
from rayopt_tpu.system import System
from rayopt_tpu.materials import air
from rayopt_tpu.ghosts import (ghost_pairs, ghost_system, ghost_trace,
                               ghost_table, ghost_text)


def _singlet(c1=1/50., c2=-1/60., t=4., n=1.6, dimg=80.):
    s = System(description="ghost singlet")
    s.append(Spheroid(material=air, radius=10.))
    s.append(Spheroid(distance=10., curvature=c1, material=n,
                      radius=10.))
    s.append(Spheroid(distance=t, curvature=c2, material=air,
                      radius=10.))
    s.append(Spheroid(distance=dimg, material=None, radius=30.))
    s.wavelengths = [587.56e-9]
    s.object.pupil.radius = 5.
    s.object.pupil.update_radius = False
    return s


def _abcd_ghost_oracle(c1, c2, t, n, dimg, h):
    """Reduced-angle (y, n*u) chain for the (1, 2) singlet ghost with
    the sign-flip reflection convention: after an odd number of
    reflections indices and gaps negate; a reflection is a refraction
    into -n."""
    y, w = h, 0.

    def gap(d, nn):
        nonlocal y
        y = y + d*w/nn

    def power(phi):
        nonlocal w
        w = w - phi*y

    power(c1*(n - 1.))          # refract 1
    gap(t, n)
    power(c2*(-n - n))          # reflect 2 (n -> -n)
    gap(-t, -n)
    power(c1*(n - (-n)))        # reflect 1 (-n -> +n)
    gap(t, n)
    power(c2*(1. - n))          # refract 2 (exit)
    gap(dimg, 1.)
    u = w                       # in air
    z = -y/u if u else np.inf
    return z, abs(y)


def test_ghost_matches_abcd_oracle():
    c1, c2, t, n, dimg = 1/50., -1/60., 4., 1.6, 80.
    s = _singlet(c1, c2, t, n, dimg)
    s.update()
    z, blur = ghost_trace(s, 1, 2)
    z_o, y_o = _abcd_ghost_oracle(c1, c2, t, n, dimg, h=5.)
    nptest.assert_allclose(z, z_o, rtol=1e-3)
    nptest.assert_allclose(blur, y_o, rtol=1e-3)


def test_plane_plate_ghost_stays_collimated():
    s = System()
    s.append(Spheroid(material=air, radius=10.))
    s.append(Spheroid(distance=10., material=1.5, radius=10.))
    s.append(Spheroid(distance=3., material=air, radius=10.))
    s.append(Spheroid(distance=50., material=None, radius=10.))
    s.wavelengths = [587.56e-9]
    s.object.pupil.radius = 4.
    s.object.pupil.update_radius = False
    z, blur = ghost_trace(s, 1, 2)
    # collimated in -> collimated ghost: no focus, full-aperture blur
    assert abs(z) > 1e6
    nptest.assert_allclose(blur, 4., rtol=1e-6)


def test_ghost_pairs_skip_index_matched():
    s = _singlet()
    # a fake zero-step surface (air-air) must not produce ghosts
    s.insert(3, Spheroid(distance=1., material=air, radius=10.))
    pairs = [(a, b) for a, b, _ in ghost_pairs(s)]
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_ghost_system_structure():
    s = _singlet()
    g = ghost_system(s, 1, 2)
    # object, s1, s2(mirror), back-through-1? no: b-1==a -> direct
    # mirror at a with negative gap, then a+1.. image
    mats = [getattr(e, "material", None) for e in g]
    assert getattr(mats[2], "mirror", False)
    assert getattr(mats[3], "mirror", False)
    # the return gap is negative (encoded as flipped heading)
    assert g[3].offset[2] < 0
    # forward again to the image
    assert g[4].offset[2] > 0


def test_ghost_table_ranks_and_formats():
    s = _singlet()
    s.update()
    rows = ghost_table(s)
    assert len(rows) == 1
    txt = ghost_text(s)
    assert "R1*R2" in txt and len(txt.splitlines()) == 3
    hazard = [r[4]/max(r[3], 1e-12)**2 for r in rows]
    assert hazard == sorted(hazard, reverse=True)


def test_ghost_coating_override():
    s = _singlet()
    s.update()
    bare = ghost_table(s)
    coated = ghost_table(s, reflectances={1: 0.005, 2: 0.005})
    assert len(coated) == len(bare) == 1
    nptest.assert_allclose(coated[0][4], 0.005**2)
    # geometry unchanged, only strength rescaled
    nptest.assert_allclose(coated[0][2], bare[0][2])
    assert coated[0][4] < bare[0][4]


def test_ghost_reflectance_from_coating_stack():
    """A CoatingStack override feeds the ghost-strength estimate with
    its normal-incidence reflectance."""
    import numpy as np
    from rayopt_tpu.models import doublet
    from rayopt_tpu.ghosts import ghost_pairs
    from rayopt_tpu.coatings import quarter_wave
    s = doublet()
    lam = s.wavelengths[0]
    plain = {(a, b): r for a, b, r in ghost_pairs(s)}
    qw = quarter_wave(1.38, lam)
    coated = {(a, b): r for a, b, r in ghost_pairs(
        s, reflectances={k: qw for k in range(1, len(s) - 1)})}
    assert coated.keys() == plain.keys()
    # exact oracle: the pair strength is the product of the stack's
    # normal-incidence reflectances at the two surfaces
    ns = [1.]
    for e in s[1:]:
        m = getattr(e, "material", None)
        ns.append(float(m.refractive_index(lam)) if m else ns[-1])
    want = {}
    R = {k: float(np.asarray(qw.reflectance(ns[k - 1], ns[k], 1.,
                                            lam)))
         for k in range(1, len(s) - 1)}
    for (a, b) in plain:
        want[(a, b)] = R[a]*R[b]
    for k in plain:
        np.testing.assert_allclose(coated[k], want[k], rtol=1e-9)
    # on the air-glass surfaces the AR coat weakens the ghost pair
    assert coated[(1, 3)] < plain[(1, 3)]
