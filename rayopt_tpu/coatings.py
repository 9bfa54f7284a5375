"""Thin-film coating stacks: multilayer Fresnel coefficients for the
polarization trace (beyond reference: rayopt has no coating model).

The standard characteristic-matrix method (Abeles/Macleod): each layer
of (complex) index n and physical thickness d contributes

    M = [[cos(delta),        i sin(delta)/eta],
         [i eta sin(delta),  cos(delta)      ]]

with phase thickness delta = 2 pi n d cos(theta) / lambda and tilted
admittance eta_s = n cos(theta), eta_p = n / cos(theta); the stack
matrix B, C = (prod M) (1, eta_substrate)^T gives

    r = (eta_in B - C)/(eta_in B + C)
    t = 2 eta_in /(eta_in B + C)

per polarization.  cos(theta) in each layer follows from the
invariant n sin(theta) with the complex square root, so absorbing
layers (metals) and beyond-critical incidence work unchanged.

Everything is vectorized over the incidence-cosine axis (one entry
per ray), so a coated surface costs a handful of 2x2 complex ops per
layer per ray inside the polarization postprocess.

Intensity conventions: R = |r|^2; transmittance into the substrate
T = Re(eta_sub)/Re(eta_in) |t|^2 (power, per polarization).

Complex indices follow Macleod's N = n - ik (absorbing k > 0 means a
negative imaginary part); since tabulations commonly quote n + ik,
inputs are coerced to the absorbing sign automatically (gain layers
are not supported).
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["CoatingStack", "quarter_wave", "stack_coefficients"]


def _absorbing(n):
    """Coerce a complex index to the Macleod N = n - ik (absorbing)
    sign convention."""
    n = np.asarray(n, complex)
    return n.real - 1j*np.abs(n.imag)


def _cos_in_medium(n_in, cos_i, n):
    """cos(theta) inside index n from the Snell invariant."""
    sin2 = (n_in/n)**2*(1. - cos_i**2)
    return jnp.sqrt(1. - sin2 + 0j)


def stack_coefficients(layers, n_in, n_sub, cos_i, wavelength):
    """(rs, rp, ts, tp) of a layer stack between media n_in / n_sub.

    layers: sequence of (n, thickness) with thickness in the same
    length unit as wavelength (both typically meters; only the ratio
    enters).  cos_i: incidence cosine array in the entrance medium.
    Complex layer indices are allowed.
    """
    cos_i = jnp.asarray(cos_i)
    n_in = jnp.asarray(_absorbing(n_in))
    n_sub = jnp.asarray(_absorbing(n_sub))
    cos_sub = _cos_in_medium(n_in, cos_i, n_sub)
    out = []
    for pol in ("s", "p"):
        def eta(n, c):
            return n*c if pol == "s" else n/c

        e_in = eta(n_in, cos_i)
        e_sub = eta(n_sub, cos_sub)
        b = jnp.ones_like(e_sub)
        c = e_sub
        for nl, dl in reversed(list(layers)):
            nl = jnp.asarray(_absorbing(nl))
            cl = _cos_in_medium(n_in, cos_i, nl)
            el = eta(nl, cl)
            delta = 2*jnp.pi*nl*dl*cl/wavelength
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            b, c = cd*b + 1j*sd*c/el, 1j*el*sd*b + cd*c
        r = (e_in*b - c)/(e_in*b + c)
        t = 2*e_in/(e_in*b + c)
        out.append((r, t))
    (rs, ts), (rp, tp) = out
    # convert the admittance-convention p coefficients to the E-field
    # amplitude convention of rayopt_tpu.polarization (p-hat = s x d):
    # r_p flips sign, t_p carries cos_i/cos_sub
    rp = -rp
    tp = tp*cos_i/cos_sub
    return rs, rp, ts, tp


class CoatingStack:
    """A named multilayer coating: layers listed from the incidence
    medium toward the substrate as (index, physical thickness).

    Used as a value in the `coatings=` dict of
    polarization.trace_polarization / PolarizationTrace: the stack
    replaces the bare-interface Fresnel coefficients at that surface
    (reflection branch for mirrors, transmission branch otherwise).
    """

    def __init__(self, layers, name="coating", substrate=None):
        #: (index_or_material, thickness) pairs; a layer given as a
        #: materials.Material evaluates its dispersion at the trace
        #: wavelength, a plain number is used as-is
        self.layers = [
            (n if hasattr(n, "refractive_index") else complex(n),
             float(d)) for n, d in layers]
        self.name = name
        #: optional substrate index override (e.g. the metal of a
        #: protected mirror); None uses the trace's medium index
        self.substrate = substrate

    def _layers_at(self, wavelength):
        return [(n.refractive_index(wavelength)
                 if hasattr(n, "refractive_index") else n, d)
                for n, d in self.layers]

    def coefficients(self, n_in, n_sub, cos_i, wavelength):
        return stack_coefficients(self._layers_at(wavelength), n_in,
                                  n_sub, cos_i, wavelength)

    def reflectance(self, n_in, n_sub, cos_i, wavelength):
        """Unpolarized power reflectance."""
        rs, rp, ts, tp = self.coefficients(n_in, n_sub, cos_i,
                                           wavelength)
        return .5*(jnp.abs(rs)**2 + jnp.abs(rp)**2)

    def transmittance(self, n_in, n_sub, cos_i, wavelength):
        """Unpolarized power transmittance into the substrate
        (E-field amplitudes: T = Re(n2 ct)/Re(n1 ci) |t|^2)."""
        rs, rp, ts, tp = self.coefficients(n_in, n_sub, cos_i,
                                           wavelength)
        cos_sub = _cos_in_medium(jnp.asarray(n_in, jnp.complex128),
                                 jnp.asarray(cos_i), n_sub)
        fac = jnp.real(n_sub*cos_sub)/jnp.real(n_in*cos_i)
        return .5*fac*(jnp.abs(ts)**2 + jnp.abs(tp)**2)

    def __repr__(self):
        return "CoatingStack(%s, %d layers)" % (self.name,
                                                len(self.layers))


def quarter_wave(n, wavelength, n_layers=1, name=None):
    """Quarter-wave layer(s) of index n at the design wavelength
    (normal incidence): d = lambda / (4 n).  Lists alternate indices
    for a stack, e.g. quarter_wave([2.35, 1.38], 550e-9, 8)."""
    ns = np.atleast_1d(np.asarray(n, dtype=complex))
    layers = []
    for k in range(n_layers):
        nk = ns[k % len(ns)]
        layers.append((nk, float(wavelength/(4*nk.real))))
    return CoatingStack(layers, name or "QW(%s)x%d" % (n, n_layers))
