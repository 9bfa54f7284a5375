"""Device-placement helpers.

The object-model front-end (System.update, pupil aiming, per-element
oracles) does lots of tiny traces; dispatching those to a remote TPU
costs a network/PCIe roundtrip each.  Policy: host-side work runs on
the CPU backend, and only large ray bundles (>= MIN_ACCEL_RAYS) go to
the accelerator.  Users can override with the RAYOPT_TPU_MIN_ACCEL_RAYS
environment variable or by entering jax.default_device themselves.
"""

import contextlib
import functools
import os

import jax

MIN_ACCEL_RAYS = int(os.environ.get("RAYOPT_TPU_MIN_ACCEL_RAYS", 4096))


@functools.lru_cache(maxsize=None)
def cpu_device():
    return jax.local_devices(backend="cpu")[0]


@functools.lru_cache(maxsize=None)
def has_accelerator():
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def device_for(nrays):
    """CPU for small bundles, default backend for big ones."""
    if not has_accelerator() or nrays >= MIN_ACCEL_RAYS:
        return None
    return cpu_device()


@contextlib.contextmanager
def placement(nrays):
    dev = device_for(nrays)
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield


@contextlib.contextmanager
def on_host():
    """Force the CPU backend (tiny eager element-level math)."""
    if not has_accelerator():
        yield
    else:
        with jax.default_device(cpu_device()):
            yield
