"""The geometric trace engine: one `lax.scan` over the surface table.

This replaces the reference's per-surface Python loop
(reference system.py:459-464, geometric_trace.py:72-80) with a single
jitted scan whose body is the fused transfer-intercept-refract step
from rayopt_tpu.ops.kernels.  Rays are carried as six (N,) component
arrays (structure-of-arrays over coordinates) so the bundle tiles the
TPU vector unit perfectly; the (N, 3) layout is only used at the API
boundary.

Two entry points:

* trace_rays       -- full history (S, N, 3) per quantity, the analog
                      of GeometricTrace's y/u/i/t arrays.
* trace_rays_final -- carry-only variant (rays after the last surface
                      plus accumulated optical path); the throughput
                      path for spot/merit/bench work with O(N) instead
                      of O(S*N) HBM traffic.
"""

import functools

import jax
import jax.numpy as jnp

from . import kernels as K


def _rows(table, start=1, stop=None):
    return jax.tree_util.tree_map(lambda a: a[start:stop], table)


def _entry(table, y0, u0, specs=None):
    x, y, z = K.split(y0)
    ux, uy, uz = K.split(u0)
    # element-0 from_normal seeds the scan (reference
    # geometric_trace.py:75-76); with static specs the rotation is
    # elided exactly as in trace_components_final and the Pallas
    # kernels, so a traced rot[0] (pose differentiation) carries the
    # same structurally-zero row-0 gradient on every engine
    if specs is None or specs[0].rotated:
        r0 = table.rot[0]
        x, y, z = K.rot_apply_t(r0, x, y, z)
        ux, uy, uz = K.rot_apply_t(r0, ux, uy, uz)
    return (x, y, z, ux, uy, uz)


@functools.partial(jax.jit, static_argnames=("clip", "specs", "unroll",
                                             "biconic"))
def trace_rays(table, y0, u0, clip=False, specs=None, unroll=False,
               biconic=False):
    """Trace rays y0, u0 (N, 3; element-0 local frame) through all
    surfaces.  Returns (y, u, i, t): (S, N, 3) x3 and (S, N), surface 0
    holding the seed (t[0] = 0), matching GeometricTrace's layout
    (reference geometric_trace.py:37-47).

    With unroll=True (and optionally specs from kernels.specialize)
    the surface loop unrolls into one fused specialized kernel -- the
    accelerator fast path; the default scan keeps compile time
    depth-independent for host work."""
    from .tables import lower_pose
    table = lower_pose(table)
    state = _entry(table, y0, u0, specs)
    if unroll:
        nsurf = table.curvature.shape[0]
        outs = []
        for j in range(1, nsurf):
            surf = jax.tree_util.tree_map(lambda a: a[j], table)
            if specs is None:
                state, (yl, ul, il, t) = K.surface_step(
                    state, surf, clip, biconic)
            else:
                state, (yl, ul, il, t) = K.surface_step_spec(
                    state, surf, specs[j], clip)
            outs.append((K.join(*yl), K.join(*ul), K.join(*il), t))
        y, u, i, t = (jnp.stack(v) for v in zip(*outs))
    else:
        def step(state, surf):
            state, (yl, ul, il, t) = K.surface_step(state, surf, clip,
                                                    biconic)
            return state, (K.join(*yl), K.join(*ul), K.join(*il), t)

        _, (y, u, i, t) = jax.lax.scan(step, state, _rows(table))
    cat = lambda a, b: jnp.concatenate([a[None], b], axis=0)
    return (cat(y0, y), cat(u0, u), cat(u0, i),
            cat(jnp.zeros(y0.shape[:-1], y0.dtype), t))


@functools.partial(jax.jit, static_argnames=("clip", "specs", "unroll",
                                             "biconic"))
def trace_components_final(table, state, clip=False, specs=None,
                           unroll=False, biconic=False):
    """Carry-only trace on component state (x, y, z, ux, uy, uz), each
    (N,).  Returns (state_local, t_total) after the last surface.

    unroll=False (default): one `lax.scan` over the surface table --
    compile time independent of system depth; the right choice on CPU
    and for host-driven work.

    unroll=True: fully unroll the surface loop so XLA fuses the whole
    transfer-intercept-refract chain into one elementwise kernel over
    the ray components (each ray is read from and written to HBM once
    regardless of surface count) and, with `specs` (the static
    kernels.SurfaceSpec tuple from kernels.specialize), each surface
    only emits the ops its geometry needs (flat/spherical/conic/
    aspheric, rotated, mirror, ...).  This is the TPU throughput path;
    XLA's CPU backend compiles deeply unrolled chains very slowly, so
    keep it off the host.
    """
    from .tables import lower_pose
    table = lower_pose(table)
    tacc = jnp.zeros_like(state[0])
    nsurf = table.curvature.shape[0]
    if specs is None or specs[0].rotated:
        # element-0 from_normal seeds the trace
        # (reference geometric_trace.py:75-76)
        r0 = table.rot[0]
        state = (*K.rot_apply_t(r0, *state[:3]),
                 *K.rot_apply_t(r0, *state[3:]))
    if unroll:
        for j in range(1, nsurf):
            surf = jax.tree_util.tree_map(lambda a: a[j], table)
            if specs is None:
                state, (yl, ul, il, t) = K.surface_step(
                    state, surf, clip, biconic)
            else:
                state, (yl, ul, il, t) = K.surface_step_spec(
                    state, surf, specs[j], clip)
            tacc = tacc + t
    else:
        def step(carry, surf):
            state, tacc = carry
            state, (yl, ul, il, t) = K.surface_step(state, surf, clip,
                                                    biconic)
            return (state, tacc + t), None

        (state, tacc), _ = jax.lax.scan(step, (state, tacc),
                                        _rows(table))
    # state is from_normal'd; recover the last surface's local frame
    if specs is None or specs[nsurf - 1].rotated:
        rl = table.rot[nsurf - 1]
        yl = K.rot_apply(rl, *state[:3])
        ul = K.rot_apply(rl, *state[3:])
    else:
        yl, ul = state[:3], state[3:]
    return (*yl, *ul), tacc


@functools.partial(jax.jit, static_argnames=("clip", "specs", "unroll",
                                             "biconic"))
def trace_rays_final(table, y0, u0, clip=False, specs=None,
                     unroll=False, biconic=False):
    """Carry-only trace: returns (y, u, t_total) after the last surface
    (local frame), with t_total the accumulated optical path."""
    state = (*K.split(y0), *K.split(u0))
    out, tacc = trace_components_final(table, state, clip=clip,
                                       specs=specs, unroll=unroll,
                                       biconic=biconic)
    return K.join(*out[:3]), K.join(*out[3:]), tacc


def trace_rays_final_fast(table, y0, u0, clip=False, specs=None,
                          tile=8*1024, precision="fast"):
    """Fastest final-state trace for the current backend.

    precision="fast" (f32-class accuracy): on TPU the Pallas fused
    kernel (ops.pallas_trace) -- the whole specialized surface chain
    runs on a VMEM-resident ray tile, one HBM read+write per ray
    regardless of depth, measured ~1.4x the XLA-unrolled chain on v5e
    (bench.py logs both).  Elsewhere (or for ray counts that don't
    tile) it falls back to trace_rays_final.

    precision="parity" (float64-class accuracy, <= 1e-9 spot-RMS
    agreement): on TPU the df32 double-single Pallas kernel
    (ops.df32, ~11x the emulated-f64 rate); on CPU, native f64.
    Returns float64 arrays.

    Both fast paths cover the FULL surface vocabulary: anamorphic
    rows (conic cylinders closed-form, general biconics/toroids by
    seeded Newton), linear gratings, and odd aspherics dispatch
    through the static per-surface specialization (f32) or the df32
    plan.  Off-TPU (or for ray counts that don't tile) everything
    falls back to the XLA engines with the right static flags.

    Not differentiable on the Pallas paths; use trace_rays_final
    under jax.grad.
    """
    n = y0.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    from .tables import is_anamorphic, lower_pose
    table = lower_pose(table)  # fold tilt/decenter for the host plans
    anam = is_anamorphic(table)
    if precision == "parity":
        if on_tpu and n % tile == 0:
            from . import df32
            # fast mode: one-round div/sqrt refinements, measured
            # 5.7e-13 spot parity (target 1e-9) at ~1.2x the rate
            steps = df32.plan(table, clip=clip, fast=True)
            out = df32.pallas_trace_df32(
                steps, df32.state_from_f64(y0, u0), tile=tile,
                with_path=True)
            comps = [df32.to_f64(c) for c in out]
            return (K.join(*comps[:3]), K.join(*comps[3:6]),
                    comps[6])
        use_specs = specs if on_tpu else None
        return trace_rays_final(table, y0, u0, clip=clip,
                                specs=use_specs, unroll=on_tpu,
                                biconic=anam and use_specs is None)
    if on_tpu and n % tile == 0:
        from .pallas_trace import pallas_trace_final
        # anamorphic/grating/odd rows: specs auto-derived from the
        # concrete table inside pallas_trace_final
        state = (*K.split(y0), *K.split(u0))
        out, tacc = pallas_trace_final(table, state, clip=clip,
                                       specs=specs, tile=tile)
        return K.join(*out[:3]), K.join(*out[3:]), tacc
    unroll = jax.default_backend() != "cpu"
    use_specs = specs if unroll else None
    return trace_rays_final(table, y0, u0, clip=clip, specs=use_specs,
                            unroll=unroll,
                            biconic=anam and use_specs is None)


@functools.partial(jax.jit, static_argnames=("clip", "specs", "unroll",
                                             "biconic"))
def trace_rays_final_multi(tables, y0, u0, clip=False, specs=None,
                           unroll=False, biconic=False):
    """Polychromatic/batched trace: `tables` is a SurfaceTable whose
    fields carry a leading batch axis (e.g. one row per wavelength,
    from System.tables), y0/u0 are (B, N, 3).  vmapped over the batch;
    the static specs are shared (the geometry is identical, only
    indices differ across wavelengths)."""
    fn = functools.partial(trace_rays_final.__wrapped__, clip=clip,
                           specs=specs, unroll=unroll, biconic=biconic)
    return jax.vmap(fn)(tables, y0, u0)
