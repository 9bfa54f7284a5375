"""Thermal system analysis: dn/dT application and expansion scaling."""

import pytest
import numpy as np
from numpy import testing as nptest

from rayopt_tpu.elements import Spheroid
from rayopt_tpu.system import System
from rayopt_tpu.materials import (air, CoefficientsMaterial, Thermal)
from rayopt_tpu.thermal import (ThermalMaterial, at_temperature,
                                thermal_defocus, thermal_text,
                                material_tce)


def _glass_with_thermal():
    # N-BK7-like Sellmeier-squared with a Schott thermal record
    m = CoefficientsMaterial(coefficients=[
        1.03961212, 0.00600069867, 0.231792344, 0.0200179144,
        1.01046945, 103.560653], typ="sellmeier_squared")
    m.thermal = Thermal(d=(1.86e-6, 1.31e-8, -1.37e-11),
                        e=(4.34e-7, 6.27e-10), tref=20., lref=.17)
    m.alpham3070 = 7.1   # 1e-6/K, AGF convention
    return m


def _singlet(mat):
    s = System(description="thermal singlet")
    s.append(Spheroid(material=air, radius=8.))
    s.append(Spheroid(distance=10., curvature=1/50., material=mat,
                      radius=8.))
    s.append(Spheroid(distance=4., curvature=-1/50., material=air,
                      radius=8.))
    s.append(Spheroid(distance=45., material=None, radius=20.))
    s.wavelengths = [587.56e-9]
    s.object.angle = 0.05   # finite field so the chief ray (and the
    s.fields = [0., 1.]     # Lagrange invariant) is nondegenerate
    return s


def test_thermal_material_shift():
    m = _glass_with_thermal()
    l = 587.56e-9
    n20 = m.refractive_index(l)
    mt = ThermalMaterial(m, 60.)
    want = n20 + m.thermal.dn_thermal(60., n20, l)
    nptest.assert_allclose(mt.refractive_index(l), want, rtol=1e-12)
    # dn/dT positive for this record
    assert mt.refractive_index(l) > n20
    nptest.assert_allclose(
        ThermalMaterial(m, 20.).refractive_index(l), n20, rtol=1e-12)


def test_tce_from_agf_record():
    m = _glass_with_thermal()
    nptest.assert_allclose(material_tce(m), 7.1e-6)
    assert material_tce(air) == 7e-6  # default when absent


def test_reference_temperature_is_identity():
    s = _singlet(_glass_with_thermal())
    s.update()
    st = at_temperature(s, 20.)
    st.update()
    t0, t1 = s.table(), st.table()
    nptest.assert_allclose(np.asarray(t1.curvature),
                           np.asarray(t0.curvature), rtol=1e-12)
    nptest.assert_allclose(np.asarray(t1.distance),
                           np.asarray(t0.distance), rtol=1e-12)
    nptest.assert_allclose(np.asarray(t1.n_after),
                           np.asarray(t0.n_after), rtol=1e-12)


def test_uniform_expansion_scales_efl():
    """With one CTE everywhere and no dn/dT, heating is a pure
    homothety: EFL scales by exactly (1 + alpha dt)."""
    from rayopt_tpu.trace.paraxial import ParaxialTrace
    m = CoefficientsMaterial(coefficients=[
        1.03961212, 0.00600069867, 0.231792344, 0.0200179144,
        1.01046945, 103.560653], typ="sellmeier_squared")
    alpha = 1e-5
    s = _singlet(m)
    s.update()
    f0 = ParaxialTrace(s).focal_length[1]
    st = at_temperature(s, 120., housing_tce=alpha,
                        default_glass_tce=alpha)
    st.update()
    f1 = ParaxialTrace(st).focal_length[1]
    nptest.assert_allclose(f1/f0, 1 + alpha*100., rtol=1e-9)


def test_thermal_defocus_and_text():
    s = _singlet(_glass_with_thermal())
    s.update()
    ts, sh = thermal_defocus(s, [0., 20., 40., 60.])
    assert sh.shape == (4,) and np.isfinite(sh).all()
    # drift is monotone for a single-glass system
    drift = sh - sh[1]
    assert (np.diff(drift) > 0).all() or (np.diff(drift) < 0).all()
    txt = thermal_text(s)
    assert "EFL" in txt and len(txt.splitlines()) == 6


def test_heat_table_matches_at_temperature():
    """The differentiable table transform reproduces the host
    at_temperature system exactly (same CTE model, exact dn at t)."""
    from rayopt_tpu.thermal import heat_table, thermal_model
    from rayopt_tpu.ops.geometric import trace_rays_final
    s = _singlet(_glass_with_thermal())
    s.update()
    t = 75.
    tab = s.table()
    model = thermal_model(s, t)
    hot = heat_table(tab, t - 20., *model)
    st = at_temperature(s, t)
    st.update()
    tab_host = st.table()
    for f in ("curvature", "distance", "radius", "n_before",
              "n_after", "mu"):
        nptest.assert_allclose(np.asarray(getattr(hot, f)),
                               np.asarray(getattr(tab_host, f)),
                               rtol=1e-12, err_msg=f)
    y = np.zeros((16, 3))
    y[:, 1] = np.linspace(-4, 4, 16)
    u = np.zeros((16, 3))
    u[:, 2] = 1.
    yh = np.asarray(trace_rays_final(hot, y, u)[0])
    yt = np.asarray(trace_rays_final(tab_host, y, u)[0])
    nptest.assert_allclose(yh, yt, atol=1e-12)


def test_heat_table_differentiable():
    """Athermalization gradients: d(defocus spread)/d(curvature)
    through the thermal transform matches finite differences."""
    import jax
    import jax.numpy as jnp
    from rayopt_tpu.thermal import heat_table, thermal_model
    from rayopt_tpu.ops.geometric import trace_rays_final
    s = _singlet(_glass_with_thermal())
    s.update()
    tab = s.table()
    temps = (0., 60.)
    models = {t: thermal_model(s, t) for t in temps}
    y = np.zeros((8, 3))
    y[:, 1] = np.linspace(.5, 4., 8)
    u = np.zeros((8, 3))
    u[:, 2] = 1.

    def spread(curv):
        tb = tab.replace(curvature=curv)
        rms = []
        for t in temps:
            hot = heat_table(tb, t - 20., *models[t])
            yf, uf, _ = trace_rays_final(hot, y, u)
            # paraxial-ish focus term: transverse extent at image
            rms.append(jnp.mean(yf[:, 1]**2))
        return rms[1] - rms[0]

    curv = jnp.asarray(tab.curvature)
    g = jax.grad(spread)(curv)
    eps = 1e-7
    i = 1
    fd = (spread(curv.at[i].add(eps))
          - spread(curv.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(g[i], fd, rtol=1e-5)


@pytest.mark.slow
def test_heat_table_extended_vocabulary():
    """The differentiable thermal transform covers the extended
    columns: anamorphic curvature splits, grating terms, and
    diffractive kick potentials match the host at_temperature path
    through the trace."""
    from rayopt_tpu.thermal import heat_table, thermal_model
    from rayopt_tpu.ops.geometric import trace_rays_final
    from rayopt_tpu.models import (hybrid_achromat, anamorphic_pair,
                                   spectrograph)
    for s in (hybrid_achromat(), anamorphic_pair(), spectrograph()):
        t = 75.
        tab = s.table()
        hot = heat_table(tab, t - 20., *thermal_model(s, t))
        st = at_temperature(s, t)
        st.update()
        tab_host = st.table()
        for f in ("curvature", "curvature_dx", "grating_dy", "doe"):
            nptest.assert_allclose(np.asarray(getattr(hot, f)),
                                   np.asarray(getattr(tab_host, f)),
                                   rtol=1e-9, err_msg=f)
        y = np.zeros((16, 3))
        y[:, 1] = np.linspace(-3, 3, 16)
        u = np.zeros((16, 3))
        u[:, 2] = 1.
        yh = np.asarray(trace_rays_final(hot, y, u, biconic=True)[0])
        yt = np.asarray(trace_rays_final(tab_host, y, u,
                                         biconic=True)[0])
        nptest.assert_allclose(yh, yt, atol=1e-10)
