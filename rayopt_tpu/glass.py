"""Glass optimization: continuous (nd, vd) relaxation, a
polychromatic differentiable merit, and catalog substitution.

The classic achromatization workflow (beyond reference -- rayopt has
no glass-variable optimization):

1. `glass_assignment(system)` maps each solid element glass onto the
   SurfaceTable rows whose refractive indices it determines.
2. `glass_tables(tables, nd, vd, assignment, wavelengths)`
   differentiably rewrites the stacked per-wavelength tables from
   free (nd, vd) parameters through the linear Abbe model
   (materials.AbbeMaterial, reference material.py:176), so jax.grad
   flows from a chromatic merit into the glass variables.
3. `polychromatic_spot_rms(tables, ...)` is that merit: ONE
   centroid-referenced RMS over the union of all wavelengths'
   spot samples, so axial and lateral color are penalized together
   with the monochromatic blur.
4. `nearest_glasses(nd, vd)` snaps the relaxed optimum to real
   catalog glasses (the bundled refractiveindex.info sqlite,
   io/library.py), and `substitute_glasses(system, ...)` writes them
   back into a System for the final fixed-glass reoptimization.

tests/test_glass.py designs a cemented achromat from two equal crown
elements this way and checks the optimizer discovers a flint.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .materials import lambda_d, lambda_C, lambda_F


def abbe_index(nd, vd, wavelength, lambda_ref=lambda_d,
               lambda_long=lambda_C, lambda_short=lambda_F):
    """materials.AbbeMaterial.refractive_index as a pure jnp
    expression (broadcasts over nd/vd/wavelength)."""
    return (nd + (wavelength - lambda_ref)
            / (lambda_long - lambda_short)*(1 - nd)/vd)


def glass_assignment(system):
    """Host-side: map each solid (non-mirror) element material onto
    the table rows it determines.

    Returns (a_before, a_after, owners): int arrays (S,) holding the
    parameter slot of the medium before/after each surface (-1 =
    fixed, e.g. air), and `owners`, the element indices whose
    materials define the slots (slot g's initial values are
    system[owners[g]].material.nd/.vd).

    Mirror systems are rejected: the propagated-index sign flips make
    glass slots ambiguous, and mirror substitution is not a glass
    pick anyway.
    """
    a_before, a_after = [], []
    cur = -1
    owners = []
    slot = {}
    for j, e in enumerate(system):
        a_before.append(cur)
        mat = getattr(e, "material", None)
        if mat is not None:
            if getattr(mat, "mirror", False):
                raise NotImplementedError(
                    "glass_assignment does not cover mirror systems")
            if getattr(mat, "solid", False):
                if j not in slot:
                    slot[j] = len(owners)
                    owners.append(j)
                cur = slot[j]
            else:
                cur = -1
        a_after.append(cur)
    return (np.asarray(a_before, np.int32),
            np.asarray(a_after, np.int32), owners)


def initial_glass_params(system, owners):
    """(nd, vd) start values from the owning elements' materials."""
    nd = np.array([float(system[j].material.nd) for j in owners])
    vd = np.array([float(system[j].material.vd) for j in owners])
    return nd, vd


def glass_tables(tables, nd, vd, assignment, wavelengths):
    """Differentiably rewrite stacked per-wavelength tables (leading
    wavelength axis, from System.tables) with indices from free
    (nd, vd) parameter vectors via the Abbe model.  Rows not owned by
    a parameter slot (air, object space) keep their table values.

    Pure jnp over (nd, vd): put it inside a merit under jax.grad and
    the glass variables join curvatures/distances as free design
    parameters.
    """
    a_before, a_after, _ = assignment
    lam = jnp.asarray(wavelengths)[:, None]
    n_g = abbe_index(jnp.asarray(nd), jnp.asarray(vd), lam)  # (L, G)
    ab = jnp.asarray(a_before)
    aa = jnp.asarray(a_after)
    nb = jnp.where(ab >= 0, n_g[:, jnp.clip(ab, 0)], tables.n_before)
    na = jnp.where(aa >= 0, n_g[:, jnp.clip(aa, 0)], tables.n_after)
    # bare rows (same medium both sides) divide to exactly 1. because
    # nb and na are the same float; refractive rows get the real ratio
    return tables.replace(n_before=nb, n_after=na, mu=nb/na)


def polychromatic_spot_rms(tables, y0, u0, w=None, specs=None,
                           unroll=True, clip=False, nan_safe=True,
                           biconic=False, engine="xla", tile=None,
                           interpret=False):
    """ONE centroid-referenced weighted RMS over the union of every
    wavelength's image-surface spot samples.

    Unlike summing per-wavelength monochromatic RMS values, the
    shared centroid makes axial color (per-color defocus rings) and
    lateral color (per-color centroid shifts) part of the merit --
    the natural achromatization objective.  Same NaN-safety scheme
    as parallel.grad.spot_rms (dead rays are donor-substituted with
    zero weight, independently per wavelength, before the
    differentiated trace).

    engine="adjoint" routes through the fused multi-wavelength Pallas
    merit kernel (ops.pallas_grad.pallas_polychromatic_spot_rms):
    identical union-RMS semantics, but the bundle is read from HBM
    once for all wavelengths and the gradient runs the in-kernel
    analytic adjoint instead of storing XLA VJP residuals -- the
    production path for chromatic optimization at >= 2^23 rays, where
    the XLA path OOMs.  Requires static specs (or a concrete table to
    derive them from) and ray counts tiling by `tile`.
    """
    if engine == "adjoint":
        from .ops.pallas_grad import (DEFAULT_TILE,
                                      pallas_polychromatic_spot_rms)
        return pallas_polychromatic_spot_rms(
            tables, y0, u0, w, specs=specs, clip=clip,
            tile=tile or DEFAULT_TILE, interpret=interpret)
    from .ops.geometric import trace_rays_final_multi
    y0 = jnp.asarray(y0)
    u0 = jnp.asarray(u0)
    nlam = tables.curvature.shape[0]
    n = y0.shape[0]
    if w is None:
        w = jnp.ones(n, y0.dtype)/n
    else:
        w = jnp.asarray(w)
    yb = jnp.broadcast_to(y0, (nlam,) + y0.shape)
    ub = jnp.broadcast_to(u0, (nlam,) + u0.shape)
    wb = jnp.broadcast_to(w/nlam, (nlam, n))
    if nan_safe:
        tab0 = jax.tree_util.tree_map(jax.lax.stop_gradient, tables)
        yp, up, _ = trace_rays_final_multi(tab0, yb, ub, clip=clip,
                                           specs=specs, unroll=unroll,
                                           biconic=biconic)
        alive = (jnp.all(jnp.isfinite(yp[..., :2]), axis=-1)
                 & jnp.all(jnp.isfinite(up), axis=-1))  # (L, N)
        i0 = jnp.argmax(alive, axis=1)                  # donor per λ
        donor_y = jnp.take_along_axis(yb, i0[:, None, None], 1)
        donor_u = jnp.take_along_axis(ub, i0[:, None, None], 1)
        yb = jnp.where(alive[..., None], yb, donor_y)
        ub = jnp.where(alive[..., None], ub, donor_u)
        wb = jnp.where(alive, wb, 0.)
    y, u, t = trace_rays_final_multi(tables, yb, ub, clip=clip,
                                     specs=specs, unroll=unroll,
                                     biconic=biconic)
    pt = y[..., :2]                                     # (L, N, 2)
    good = jnp.all(jnp.isfinite(pt), axis=-1)
    wg = jnp.where(good, wb, 0.)
    pt = jnp.where(good[..., None], pt, 0.)
    wsum = wg.sum()
    mean = (wg[..., None]*pt).sum((0, 1))/wsum
    r2 = (wg*jnp.square(pt - mean).sum(-1)).sum()/wsum
    return jnp.sqrt(r2 + 1e-30)


#: the populated region of the vendor glass maps: outside this box
#: the relaxed optimum cannot be snapped to a real melt, so bounded
#: optimization keeps the continuous solution honest (an unbounded
#: chromatic merit always runs to vd -> inf, "dispersionless glass")
GLASS_BOX = {"nd": (1.44, 2.05), "vd": (18., 85.)}


def glass_box_encode(nd, vd, box=None):
    """(nd, vd) -> unconstrained logits for bounded optimization
    (inverse of glass_box_decode; values are clipped 1% inside the
    box so catalog edge glasses stay representable)."""
    box = box or GLASS_BOX
    out = []
    for v, (lo, hi) in ((nd, box["nd"]), (vd, box["vd"])):
        t = np.clip((np.asarray(v, float) - lo)/(hi - lo), .01, .99)
        out.append(np.log(t/(1 - t)))
    return tuple(out)


def glass_box_decode(xi_nd, xi_vd, box=None):
    """Unconstrained logits -> (nd, vd) inside the glass-map box via
    a sigmoid: optimize the logits freely, the glasses stay
    physical.  Pure jnp (differentiable)."""
    box = box or GLASS_BOX
    lo_n, hi_n = box["nd"]
    lo_v, hi_v = box["vd"]
    nd = lo_n + (hi_n - lo_n)*jax.nn.sigmoid(xi_nd)
    vd = lo_v + (hi_v - lo_v)*jax.nn.sigmoid(xi_vd)
    return nd, vd


def nearest_glasses(nd, vd, count=5, library=None, nd_scale=0.01,
                    vd_scale=1.5, catalog="glass"):
    """Catalog glasses nearest a relaxed (nd, vd) optimum.

    Distance is Euclidean in normalized glass-map coordinates
    (delta nd / nd_scale, delta vd / vd_scale); the defaults weight
    0.01 in index equal to 1.5 in Abbe number, roughly the grid
    spacing of a vendor glass map.  Returns a list of dicts
    (name, nd, vd, distance), closest first, drawn from the bundled
    refractiveindex.info sqlite (io/library.py).

    `catalog` is the rii shelf; the default "glass" restricts to the
    825 vendor optical glasses (SCHOTT/OHARA/HOYA/SUMITA/CDGM books).
    Pass None to search everything (crystals, polymers, ...).
    """
    from .io.library import Library
    lib = library if library is not None else Library.one()
    q = ("select m.name as name, m.nd as nd, m.vd as vd "
         "from material m join catalog c on m.catalog_id = c.id "
         "where m.solid = 1 and m.nd is not null "
         "and m.vd is not null and m.vd between 8 and 120 "
         "and m.nd between 1.3 and 2.3")
    args = []
    if catalog is not None:
        q += " and lower(c.name) = lower(?)"
        args.append(catalog)
    rows = lib.conn.execute(q, args).fetchall()
    if not rows:
        raise KeyError("no catalog glasses matched (catalog=%r)"
                       % (catalog,))
    out = []
    for r in rows:
        dist = np.hypot((r["nd"] - nd)/nd_scale,
                        (r["vd"] - vd)/vd_scale)
        out.append({"name": r["name"], "nd": float(r["nd"]),
                    "vd": float(r["vd"]), "distance": float(dist)})
    out.sort(key=lambda d: d["distance"])
    return out[:count]


def substitute_glasses(system, nd, vd, owners, library=None,
                       catalog="glass"):
    """Write the nearest catalog glass for each relaxed (nd, vd)
    optimum back into a (copied) System.

    Returns (system, picks): picks[g] is the chosen nearest_glasses
    record for parameter slot g (element owners[g]).  The returned
    system is updated and ready for the final fixed-glass
    reoptimization of its geometric variables.
    """
    import copy
    from .materials import Material
    s = copy.deepcopy(system)
    picks = []
    for g, j in enumerate(owners):
        best = nearest_glasses(float(nd[g]), float(vd[g]), count=1,
                               library=library, catalog=catalog)[0]
        s[j].material = Material.make(best["name"])
        picks.append(best)
    s.update()
    return s, picks
