"""System serialization: YAML / JSON / text / array round-trip.

Parity with reference formats.py:29-104; the dict schema matches the
reference so prescriptions written for either implementation load in
both.
"""

import json

import numpy as np
import yaml

from .system import System
from .elements import Spheroid
from .materials import Material


def try_get(line, columns, field, default=None):
    v = default
    if field in columns:
        v = line[columns.index(field)]
        try:
            v = float(v)
        except ValueError:
            pass
    return v


def system_from_array(data,
                      columns="type roc distance diameter material".split(),
                      shifts={}, material_map={}, **kwargs):
    """Build a System from a column table (reference formats.py:40)."""
    data = np.array(data)
    assert data.ndim == 2
    for k, v in shifts.items():
        i = columns.index(k)
        data[:, i] = np.roll(data[:, i], v)
    s = System(**kwargs)
    for line in data:
        typ = try_get(line, columns, "type", "S")
        el = Spheroid()
        s.append(el)
        if typ == "A":
            s.aperture = el
        curv = try_get(line, columns, "curvature")
        if curv is None:
            roc = try_get(line, columns, "roc", 0.)
            curv = 0. if roc == 0 else 1./roc
        el.curvature = curv
        el.distance = try_get(line, columns, "distance", 0.)
        el.radius = (try_get(line, columns, "radius", 0.) or
                     try_get(line, columns, "diameter", 0.)/2.)
        if typ == "O":
            el.angular_radius = el.radius
        mat = try_get(line, columns, "material")
        mat = material_map.get(mat, mat)
        el.material = Material.make(mat)
    return s


def system_from_text(text, *args, **kwargs):
    array = [line.split() for line in text.splitlines()]
    n = max(len(line) for line in array)
    array = [line for line in array if len(line) == n]
    return system_from_array(array, *args, **kwargs)


def system_from_yaml(text):
    dat = yaml.safe_load(text)
    if not isinstance(dat, dict):
        raise ValueError(
            "expected a YAML mapping describing a system, got %r"
            % type(dat).__name__)
    typ = dat.pop("type", "system")
    if typ != "system":
        raise ValueError("not a system description (type: %r)" % typ)
    return System(**dat)


def system_to_yaml(system):
    return yaml.dump(system.dict(), default_flow_style=None)


def system_from_json(text):
    dat = json.loads(text)
    if not isinstance(dat, dict):
        raise ValueError(
            "expected a JSON object describing a system, got %r"
            % type(dat).__name__)
    typ = dat.pop("type", "system")
    if typ != "system":
        raise ValueError("not a system description (type: %r)" % typ)
    return System(**dat)


def system_to_json(system):
    return json.dumps(system.dict())
