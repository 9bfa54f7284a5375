"""Serialization round trips (mirrors reference test_yaml.py)."""

from rayopt_tpu import (
    system_from_yaml, system_to_yaml, system_from_json, system_to_json)

TRIPLET = """
description: oslo cooke triplet example 50mm f/4 20deg
wavelengths: [546.1e-9, 486.e-9, 656.e-9]
object: {angle_deg: 20, pupil: {radius: 6.25}}
stop: 4
elements:
- {material: air}
- {distance: 5, radius: 6.5, roc: 21.25, material: schott-sk|n-sk16}
- {distance: 2, radius: 6.5, roc: -158.65, material: air}
- {distance: 6, radius: 5, roc: -20.25, material: schott-f|n-f2}
- {distance: 1, radius: 5, roc: 19.3, material: air}
- {distance: 6, radius: 6.5, roc: 141.25, material: schott-sk|n-sk16}
- {distance: 2, radius: 6.5, roc: -17.285, material: air}
- {distance: 42.95, radius: .364, material: air}
"""


def test_load():
    s = system_from_yaml(TRIPLET)
    assert s is not None
    assert len(s) == 8


def test_yaml_roundtrip():
    s = system_from_yaml(TRIPLET)
    d = system_to_yaml(s)
    s2 = system_from_yaml(d)
    assert len(s2) == len(s)
    assert system_to_yaml(s2) == d


def test_json_roundtrip():
    s = system_from_yaml(TRIPLET)
    d = system_to_json(s)
    s2 = system_from_json(d)
    assert system_to_json(s2) == d


def test_roundtrip_preserves_trace():
    import numpy as np
    s = system_from_yaml(TRIPLET)
    s.update()
    s2 = system_from_yaml(system_to_yaml(s))
    s2.update()
    np.testing.assert_allclose(s2.paraxial.focal_length,
                               s.paraxial.focal_length, rtol=1e-12)


def test_pupil_types_roundtrip():
    """All four pupil parameterizations serialize and rebuild."""
    from rayopt_tpu.pupils import Pupil
    import numpy as np
    for spec in (dict(type="radius", radius=5., distance=50.),
                 dict(type="na", na=.2, distance=50.),
                 dict(type="slope", slope=.1, distance=50.),
                 dict(type="fno", fno=2.8, distance=50.)):
        p = Pupil.make(dict(spec))
        q = Pupil.make(p.dict())
        np.testing.assert_allclose(q.radius, p.radius, rtol=1e-12)
        np.testing.assert_allclose(q.na, p.na, rtol=1e-12)
        np.testing.assert_allclose(q.fno, p.fno, rtol=1e-12)
        assert type(q) is type(p)


def test_unnamed_material_round_trip():
    """Float-index and nd/vd materials have no resolvable name ('-'):
    their dicts must persist through YAML instead of a dead string."""
    import numpy.testing as nptest
    import rayopt_tpu as ro
    import rayopt_tpu.formats as fmt
    s = ro.System([
        dict(material="air"),
        dict(roc=40., distance=4., material=1.613, radius=8.),
        dict(roc=-40., distance=3., material="1.51680/64.17",
             radius=8.),
        dict(distance=50., radius=8.),
    ], wavelengths=[550e-9])
    s.update()
    s2 = fmt.system_from_yaml(fmt.system_to_yaml(s))
    s2.update()
    for j in (1, 2):
        nptest.assert_allclose(
            s2[j].material.refractive_index(550e-9),
            s[j].material.refractive_index(550e-9), rtol=1e-12)
