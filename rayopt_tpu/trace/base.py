"""Common trace-state holder (behavioral parity with reference
raytrace.py:25-65): caches the system's geometry vectors at propagate
time and provides the shared table printer and global-frame helper."""

import numpy as np


class Trace:
    def __init__(self, system):
        self.system = system

    def allocate(self):
        self.length = len(self.system)

    def propagate(self):
        # snapshot the geometry the trace was run against
        for name in ("path", "track", "origins", "mirrored"):
            setattr(self, name, getattr(self.system, name))

    def from_axis(self, y, i=None, ref=0):
        """Rotate per-element axial samples into the global (lab)
        frame, splitting the z range at the element boundaries."""
        y = np.atleast_3d(y)  # (z, ray, xyz)
        if i is None:
            i = np.searchsorted(y[:, ref, 2], self.path)
        segments = []
        for j, block in enumerate(np.vsplit(y, i)):
            if block.ndim <= 1 or not block.size:
                continue
            j = min(self.length - 1, j)
            el = self.system[j]
            pts = block.reshape(-1, 3) - (0, 0, self.path[j])
            pts = self.origins[j] + el.from_axis(pts)
            segments.append(pts.reshape(block.shape))
        return np.vstack(segments)

    def print_coeffs(self, coeff, labels, sum=True):
        """Tabulate per-surface coefficients with an optional column
        sum (the common text-dump format of all engines)."""
        widths = "%2s %1s" + "% 10s"*len(labels)
        yield widths % (("#", "T") + tuple(labels))
        fmt = "%2s %1s" + "% 10.4g"*len(labels)
        for i, row in enumerate(coeff):
            yield fmt % ((i, self.system[i].typeletter) + tuple(row))
        if sum:
            yield fmt % (("", "") + tuple(coeff.sum(0)))

    def align(self):
        self.system.align(self.n)
        self.propagate()
