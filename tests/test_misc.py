"""special_sums doctests, solver caches, analysis smoke test, and the
pickup/solve/validate declarative layer."""

import doctest

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu.utils.special_sums as special_sums
from rayopt_tpu.utils.special_sums import angle_sum, polar_sum
from rayopt_tpu.utils.cachend import (
    CacheND, PolarCacheND, NearestCacheND, LinearCacheND)


def test_special_sums_doctests():
    results = doctest.testmod(special_sums)
    assert results.failed == 0
    assert results.attempted > 5


def test_angle_sum_conservation():
    rng = np.random.RandomState(0)
    m = rng.rand(37, 53)
    for ang in (0., .3, np.pi/4, 2.):
        nptest.assert_allclose(angle_sum(m, ang).sum(), m.sum())


def test_polar_sum_conservation():
    rng = np.random.RandomState(1)
    m = rng.rand(31, 41)
    for d in ("radial", "azimuthal"):
        nptest.assert_allclose(polar_sum(m, (15.5, 20.5), d).sum(),
                               m.sum())


class TestCache:
    def solver(self, *x, guess=None, **k):
        self.calls += 1
        self.guesses.append(guess)
        return np.array([sum(x), np.prod(x)])

    def setup_method(self):
        self.calls = 0
        self.guesses = []

    @pytest.mark.parametrize("cls", [PolarCacheND, NearestCacheND,
                                     LinearCacheND])
    def test_cache_exact(self, cls):
        c = cls(self.solver)
        v1 = c(1., 2.)
        nptest.assert_allclose(v1, [3., 2.])
        v2 = c(1., 2.)
        nptest.assert_allclose(v2, v1)
        assert self.calls == 1  # second call was cached

    def test_polar_guess_forwarded(self):
        c = PolarCacheND(self.solver)
        c(1., 0.)
        c(3., 0.)
        c(2., 0.)  # radially between -> interpolated guess
        assert self.guesses[2] is not None
        nptest.assert_allclose(self.guesses[2],
                               (np.array([1., 1.]) +
                                np.array([3., 3.*1.]))/1, atol=10)


def test_analysis_smoke():
    import matplotlib
    matplotlib.use("agg")
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    s = cooke_triplet()
    a = Analysis(s, print=False, defocus=3)
    assert len(a.figures) == 5
    assert len(a.text) == 2
    assert "focal length" in a.text[1]
    import matplotlib.pyplot as plt
    plt.close("all")


def test_analysis_flags():
    """run/print are pure flags (no method shadowing): run=False does
    no work, and generate() can be invoked explicitly afterwards."""
    import matplotlib
    matplotlib.use("agg")
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    s = cooke_triplet()
    a = Analysis(s, run=False, print=False)
    assert a.figures == [] and a.text == []
    assert a.run is False
    a.generate()
    assert len(a.figures) == 5 and len(a.text) == 2
    import matplotlib.pyplot as plt
    plt.close("all")


def test_analysis_print_flag(capsys):
    import matplotlib
    matplotlib.use("agg")
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    s = cooke_triplet()
    Analysis(s, print=False, defocus=3)
    assert capsys.readouterr().out == ""
    Analysis(s, print=True, defocus=3)
    assert "focal length" in capsys.readouterr().out
    import matplotlib.pyplot as plt
    plt.close("all")


def test_object_row_sets_field():
    """A type-O row's aperture feeds the object conjugate (angular
    radius for infinite conjugates) instead of a dead attribute."""
    import rayopt_tpu as ro
    txt = """
    O 0      20   .3    AIR
    S 50     5    20    SCHOTT-BK|N-BK7
    S -50    5    20    AIR
    A 0      3    18    AIR
    I 0      40   30    AIR
    """
    s = ro.system_from_text(
        txt, "type roc distance diameter material".split())
    nptest.assert_allclose(s.object.angle, .15)


def test_pickup_solve_validate():
    from rayopt_tpu import system_from_yaml
    s = system_from_yaml("""
description: solver test
object: {angle_deg: 5, pupil: {radius: 2}}
elements:
- {material: air}
- {roc: 50, distance: 5, material: SCHOTT-BK|N-BK7, radius: 10}
- {roc: -50, distance: 5, material: air, radius: 10}
- {distance: 40, radius: 5}
pickups:
- {get: [1, radius], set: [2, radius], factor: 2.}
validators:
- {get: [1, distance], minimum: 1}
solves:
- {set: [2, distance], get: [edge_y, 2], target: 3.}
""")
    s.update()
    assert s[2].radius == 20.
    # the solve drove the edge thickness to the target
    nptest.assert_allclose(s.edge_y[2], 3., atol=1e-7)
    # validator trips when violated
    s[1].distance = .5
    with pytest.raises(ValueError):
        s.validate()


def test_paraxial_refocus_solve():
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    s.paraxial.refocus()
    s.update()
    nptest.assert_allclose(s.paraxial.y[-1, 0], 0, atol=1e-9)


def test_focal_length_solve():
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    s.paraxial.focal_length_solve(55.)
    s.update()
    nptest.assert_allclose(s.paraxial.focal_length[1], 55., rtol=1e-6)


@pytest.mark.slow
def test_vignetting_panel():
    """The vignetting diagram renders from the batched rim solve and
    shows vignetting at the field edge for the Cooke triplet."""
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.analysis import plot_vignetting
    s = cooke_triplet()
    fig, ax = plt.subplots()
    plot_vignetting(s, ax, nfields=6)
    lines = ax.get_lines()
    assert len(lines) >= 3
    upper = lines[0].get_ydata()
    assert upper[0] > upper[-1]  # rim shrinks toward the field edge
    plt.close(fig)


@pytest.mark.slow
def test_analysis_vignetting_flag():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    a = Analysis(cooke_triplet(), print=False, plot_vignetting=True,
                 defocus=3)
    assert len(a.figures) == 6
    plt.close("all")


@pytest.mark.slow
def test_analysis_mtf_field_and_ghosts():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    from rayopt_tpu.analysis import plot_mtf_vs_field
    a = Analysis(cooke_triplet(), print=False, plot_mtf_field=True,
                 print_ghosts=True, defocus=3)
    assert len(a.figures) == 6
    assert any("ghost analysis" in t for t in a.text)
    heights, curves = plot_mtf_vs_field(a.system, plt.gca(), nfields=3)
    assert curves.shape == (3, 2, 3)
    finite = curves[np.isfinite(curves)]
    assert finite.size and (finite >= 0).all() and (finite <= 1.01).all()
    # lowest frequency has the highest MTF on axis
    on_axis = curves[:, 0, 0]
    assert on_axis[0] >= on_axis[-1]
    plt.close("all")


def test_analysis_export_html(tmp_path):
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    a = Analysis(cooke_triplet(), print=False, defocus=3)
    out = tmp_path/"report.html"
    doc = a.export_html(str(out))
    assert out.exists()
    assert doc.count("data:image/png;base64,") == len(a.figures)
    assert "<pre>" in doc and "focal length" in doc
    plt.close("all")


def test_analysis_footprints_and_thermal():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    a = Analysis(cooke_triplet(), print=False, plot_footprints=True,
                 print_thermal=True, defocus=3)
    assert len(a.figures) == 6
    assert any("thermal analysis" in t for t in a.text)
    plt.close("all")


def test_mtf_through_focus():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.analysis import plot_mtf_through_focus
    s = cooke_triplet()
    shifts, curves = plot_mtf_through_focus(
        s, plt.gca(), height=0., nsteps=9, nrays=200, window=20.)
    assert shifts.shape == (9,) and curves.shape == (3, 2, 9)
    finite = curves[np.isfinite(curves)]
    assert finite.size and (finite >= 0).all() and (finite <= 1.01).all()
    # a wide sweep brackets best focus: the lowest-frequency
    # tangential curve peaks strictly inside the window
    c = curves[0, 0]
    assert 0 < np.nanargmax(c) < len(c) - 1
    # the image plane was restored
    s2 = cooke_triplet()
    assert s[-1].distance == s2[-1].distance
    plt.close("all")


def test_layout_3d():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis, System
    from rayopt_tpu.analysis import plot_layout_3d
    ax = plot_layout_3d(cooke_triplet())
    # wireframes for the 7 finite-radius surfaces + ray polylines
    assert len(ax.collections) >= 7
    assert len(ax.lines) > 0
    # a tilted fold mirror folds the drawn geometry off the z axis:
    # some mesh y extents must be comparable to the fold arm length
    s = System([
        dict(material="vacuum"),
        dict(material="mirror", distance=10.,
             angles=(np.pi/4, 0, 0), radius=4.),
        dict(material="vacuum", distance=-10.,
             direction=(0, 1., 0), radius=2.),
    ])
    ax2 = plot_layout_3d(s, nrays=0)
    assert len(ax2.collections) >= 2
    # the fold arm runs along +y: the drawn volume is y-extended
    ylo, yhi = ax2.get_zlim()  # plot maps lab y -> matplotlib z
    assert yhi - ylo > 5.
    a = Analysis(cooke_triplet(), print=False, plot_3d=True, defocus=3)
    assert len(a.figures) == 6
    plt.close("all")

def test_validate_equality_tolerant():
    """Equality validators pass within solver tolerance (the
    reference's float == misfires after any solve that converges to
    tolerance, reference system.py:213-247); a spec-level `tolerance`
    widens it; genuine mismatches still raise."""
    from rayopt_tpu.formats import system_from_yaml
    s = system_from_yaml("""
description: solved doublet with an equality validator
object:
  type: finite
  radius: 1.0
  pupil: {type: slope, slope: .001, distance: 100.,
          update_distance: False}
elements:
- {material: vacuum}
- {material: 1.51872, distance: 99.9, curvature: 1.611356421}
- {material: 1.66238, distance: .1, curvature: -2.455396159}
- {material: vacuum, distance: 0.0661308, curvature: -0.786448792}
- {distance: 0.93402287}
solves:
- set: [3, curvature]
  get_eval: "self.paraxial.update() or float(self.paraxial.focal_length[1])"
  target: 1.05
  init: -0.786
validators:
- {get_eval: "float(self.paraxial.focal_length[1])", equality: 1.05}
""")
    s.update()  # the solve lands within its root tolerance
    s.validate()  # tolerant equality accepts it
    # the check is genuinely tolerant: a value off by < rtol passes
    from rayopt_tpu.system import System
    assert System._almost_equal(1.05*(1 + 1e-10), 1.05)
    assert not System._almost_equal(1.05*(1 + 1e-6), 1.05)
    # a genuinely wrong equality still raises
    s.validators.append({"get_eval":
                         "float(self.paraxial.focal_length[1])",
                         "equality": 2.0})
    with pytest.raises(ValueError):
        s.validate()
    s.validators.pop()
    # spec-level tolerance is honored
    s.validators.append({"get_eval":
                         "float(self.paraxial.focal_length[1])",
                         "equality": 1.06, "tolerance": .05})
    s.validate()
