"""Ahead-of-time export of trace programs for serving.

A designed system's trace is a pure jitted function of its
SurfaceTable; `jax.export` serializes the compiled-trace StableHLO so
a serving process (or another host without the Python front-end) can
rehydrate and run it without retracing/recompiling Python.  This is
the deployment half of the framework: design interactively, export
the hot program, serve it.

    blob = export_trace(system, nrays=1 << 20)
    open("trace.bin", "wb").write(blob)
    # ... in the serving process:
    fn = load_trace(open("trace.bin", "rb").read())
    y_out, u_out, t = fn(y, u)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..ops.geometric import trace_rays_final
from ..ops.kernels import specialize


def trace_closure(system, wavelength=None, clip=False, dtype=None):
    """(fn, example_args): the system's final-state trace with the
    table baked in as constants -- the jittable serving entry point."""
    table = system.table(wavelength)
    specs = specialize(table)
    if dtype is not None:
        table = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), table)

    def fn(y, u):
        return trace_rays_final(table, y, u, clip=clip, specs=specs,
                                unroll=True)

    return fn


def export_trace(system, nrays, wavelength=None, clip=False,
                 dtype=np.float32, platforms=None):
    """Serialize the system's compiled trace (StableHLO bytes).

    The ray count is a static shape (serving batches are padded to
    it); dtype defaults to the f32 throughput path.
    """
    fn = trace_closure(system, wavelength, clip, dtype)
    spec = jax.ShapeDtypeStruct((nrays, 3), dtype)
    exported = jax_export.export(
        jax.jit(fn), platforms=platforms)(spec, spec)
    return exported.serialize()


def load_trace(blob):
    """Rehydrate an exported trace; returns a callable (y, u) ->
    (y_final, u_final, t)."""
    exported = jax_export.deserialize(blob)
    return lambda y, u: exported.call(y, u)
