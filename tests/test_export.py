"""AOT export/serve round trip: the serialized StableHLO trace
reproduces the live engine."""

import pytest
import numpy as np
from numpy import testing as nptest

import rayopt_tpu  # noqa: F401
from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.utils.export import export_trace, load_trace


@pytest.mark.slow
def test_export_roundtrip():
    s = cooke_triplet()
    n = 256
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3), np.float32)
    y[:, :2] = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    u = np.zeros((n, 3), np.float32)
    u[:, 2] = 1.

    blob = export_trace(s, nrays=n)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = load_trace(blob)
    y1, u1, t1 = map(np.asarray, fn(y, u))

    # bit-exact against the jitted closure it was exported from
    import jax
    from rayopt_tpu.utils.export import trace_closure
    live = jax.jit(trace_closure(s, dtype=np.float32))
    y0, u0, t0 = map(np.asarray, live(y, u))
    nptest.assert_array_equal(y1, y0)
    nptest.assert_array_equal(u1, u0)
    nptest.assert_array_equal(t1, t0)

    # and physically equal to the runtime-table engine at f32 rounding
    # (constants baked into the export fold slightly differently)
    import jax.numpy as jnp
    from rayopt_tpu.ops.kernels import specialize
    tab64 = s.table()
    tab = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tab64)
    y2, u2, t2 = map(np.asarray, trace_rays_final(
        tab, y, u, specs=specialize(tab64), unroll=True))
    nptest.assert_allclose(y1, y2, atol=2e-5)
    nptest.assert_allclose(u1, u2, atol=2e-5)
    nptest.assert_allclose(t1, t2, atol=2e-4)
