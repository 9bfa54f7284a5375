"""Aberration-polynomial trace benchmark: ops.poly_jax on the
accelerator vs the host PolyTrace, at high order (kmax >= 11).

The polynomial state is (6, q) coefficient vectors with
q = simplex_size(3, kmax) (286 at kmax=11); per-surface updates are
sparse index-table contractions.  This is a tiny-tensor workload --
the interesting questions are (a) does the jitted recursion beat the
host NumPy implementation at high order, and (b) what does a vmapped
batch (the tolerancing shape) cost per member.

Run: python benchmarks/bench_poly.py [kmax] [batch]
Prints one JSON line with host/device timings.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import rayopt_tpu  # noqa: F401
    from rayopt_tpu.models import double_gauss
    from rayopt_tpu import PolyTrace
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.ops.poly_jax import poly_trace_table

    kmax = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    s = double_gauss()
    s.update()
    tab = s.table(s.wavelengths[0])
    specs = specialize(tab)
    pd = s.object.pupil.distance

    def timed(fn, k=5):
        fn()
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # host reference
    t_host = timed(lambda: PolyTrace(s, kmax))

    # single jitted trace
    float(jax.jit(lambda x: x*2 + 1)(jnp.ones(8))[0])
    one = jax.jit(lambda t: poly_trace_table(t, specs, kmax, pd)[0])
    # scalar fetch: block_until_ready does NOT synchronize on the
    # tunnel backend (the round-3 numbers timed only the async
    # dispatch and were ~2600x too small)
    t_dev = timed(lambda: float(np.asarray(one(tab)).ravel()[0]))

    # vmapped batch (tolerancing shape): perturb curvature
    tabs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (batch,) + np.shape(a)), tab)
    key = jax.random.PRNGKey(0)
    curv = tabs.curvature + 1e-6*jax.random.normal(
        key, tabs.curvature.shape)
    curv = jnp.where(tabs.curvature == 0, 0., curv)
    tabs = tabs.replace(curvature=curv)
    many = jax.jit(jax.vmap(
        lambda t: poly_trace_table(t, specs, kmax, pd)[0][-1, :2]))
    t_batch = timed(lambda: float(np.asarray(many(tabs)).ravel()[0]))

    # parity spot check
    host = PolyTrace(s, kmax)
    dev = np.asarray(one(tab))
    err = float(np.nanmax(np.abs(dev - host.stvwof) /
                          (1 + np.abs(host.stvwof))))

    print(json.dumps({
        "metric": "poly_trace",
        "kmax": kmax,
        "q": dev.shape[-1],
        "backend": jax.default_backend(),
        "host_ms": t_host*1e3,
        "device_ms": t_dev*1e3,
        "device_batch%d_ms" % batch: t_batch*1e3,
        "per_member_us": t_batch/batch*1e6,
        "speedup_single": t_host/t_dev,
        "max_rel_err": err,
    }))


if __name__ == "__main__":
    main()
