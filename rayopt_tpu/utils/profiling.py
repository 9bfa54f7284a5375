"""Profiling and structured trace-dump helpers.

The reference's only observability is text dumps (print_trace); here
we add jax.profiler integration (xprof traces viewable in
TensorBoard/Perfetto) and wall-clock timers that understand async
dispatch.
"""

import contextlib
import json
import time

import numpy as np


@contextlib.contextmanager
def xprof(logdir="/tmp/rayopt_tpu_profile"):
    """Capture a device profile around a block:

        with xprof() as dir:
            trace_rays_final(...)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on async jax results."""

    def __init__(self):
        self.records = {}

    @contextlib.contextmanager
    def __call__(self, name, result=None):
        import jax
        t0 = time.perf_counter()
        box = {}
        yield box
        if "result" in box:
            jax.block_until_ready(box["result"])
        self.records.setdefault(name, []).append(
            time.perf_counter() - t0)

    def summary(self):
        return {k: {"n": len(v), "best": min(v), "mean": float(np.mean(v))}
                for k, v in self.records.items()}


def trace_dump(trace, path):
    """Structured JSON dump of a GeometricTrace (per-surface ray
    state), the machine-readable counterpart of print_trace."""
    data = {
        "wavelength": float(trace.l),
        "nrays": int(trace.nrays),
        "n": np.asarray(trace.n).tolist(),
        "y": np.asarray(trace.y).tolist(),
        "u": np.asarray(trace.u).tolist(),
        "i": np.asarray(trace.i).tolist(),
        "t": np.asarray(trace.t).tolist(),
    }
    with open(path, "w") as f:
        json.dump(data, f)
    return path
