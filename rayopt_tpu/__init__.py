"""rayopt_tpu — a TPU-native optical design and ray-tracing framework.

Capabilities mirror quartiq/rayopt (see /root/reference and SURVEY.md):
sequential geometric / paraxial / gaussian / polynomial-aberration ray
tracing, pupils/conjugates and ray aiming, materials and dispersion,
aberration analysis, differentiable optimization, and lens-format I/O.

The compute plane is built JAX-first: systems lower to a struct-of-arrays
`SurfaceTable` pytree; traces are pure jitted functions (`lax.scan` over
surfaces with ray bundles batched on the VPU/MXU); everything is
differentiable end-to-end so merit-function optimization uses `jax.grad`
instead of finite differences; ray bundles shard across TPU chips via
`shard_map` over a `jax.sharding.Mesh` (see `rayopt_tpu.parallel`).

Numerics default to float64 (matching the NumPy reference semantics);
pass float32 tables/rays explicitly for TPU throughput work, or set
RAYOPT_TPU_NO_X64=1 to leave JAX in 32-bit mode.
"""

import os

import jax

if os.environ.get("RAYOPT_TPU_FORCE_CPU"):
    # kill-switch for machines whose accelerator plugin wedges device
    # discovery (e.g. a dead TPU tunnel hangs jax.devices() forever):
    # pin the CPU backend BEFORE anything can touch the default
    # backend.  Must be set before the first backend use; ignored if
    # jax is already initialized.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as _e:
        import warnings
        warnings.warn(
            "RAYOPT_TPU_FORCE_CPU is set but the CPU pin failed "
            "(jax backends already initialized?): %s -- accelerator "
            "device discovery may hang" % (_e,))

if not os.environ.get("RAYOPT_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

from .utils.math import (  # noqa: E402,F401
    sinarctan, tanarcsin, norm, normalize, normalize_z,
    sagittal_meridional, sfloat, sint,
)
from .utils.distributions import (  # noqa: E402,F401
    pupil_distribution, gl_roots, gr_roots, interval_to_circle,
)
from .utils.cachend import (  # noqa: E402,F401
    CacheND, NearestCacheND, LinearCacheND, PolarCacheND,
)
from .materials import (  # noqa: E402,F401
    Material, ModelMaterial, AbbeMaterial, CoefficientsMaterial,
    vacuum, mirror, air, fraunhofer, Thermal,
)
from .elements import (  # noqa: E402,F401
    Element, Interface, Spheroid, Biconic, Toroid, Grating,
    DiffractiveSurface, ForbesQcon, FreeformXY, ZernikeSag,
    TransformMixin,
)
from .utils.registry import NameMixin  # noqa: E402,F401
from .pupils import Pupil, RadiusPupil, NaPupil, SlopePupil, FnoPupil  # noqa: E402,F401
from .conjugates import Conjugate, FiniteConjugate, InfiniteConjugate  # noqa: E402,F401
from .system import System  # noqa: E402,F401
from .trace.base import Trace  # noqa: E402,F401
from .trace.paraxial import ParaxialTrace  # noqa: E402,F401
from .trace.geometric import GeometricTrace, FullTrace  # noqa: E402,F401
from .trace.gaussian import GaussianTrace  # noqa: E402,F401
from .trace.poly import PolyTrace, PolyState  # noqa: E402,F401
from .formats import (  # noqa: E402,F401
    system_from_yaml, system_to_yaml, system_from_json, system_to_json,
    system_from_array, system_from_text,
)
from .analysis import Analysis  # noqa: E402,F401
from .optimize import optimize, Variable, PathVariable, Operand, FuncOp  # noqa: E402,F401
from .io.zemax import zmx_to_system, system_to_zmx  # noqa: E402,F401
from .io.oslo import len_to_system, olc_to_system  # noqa: E402,F401
from .io.codev import seq_to_system  # noqa: E402,F401
from .ghosts import ghost_table, ghost_text, ghost_system  # noqa: E402,F401
from .polarization import (  # noqa: E402,F401
    PolarizationTrace, trace_polarization, fresnel_coefficients,
    jones_diattenuation, jones_retardance, jones_to_mueller,
)
from .coatings import (  # noqa: E402,F401
    CoatingStack, quarter_wave,
)
from .imaging import (  # noqa: E402,F401
    simulate_image, field_psf, star_target, simulate_image_orders,
)
from .gratings import (  # noqa: E402,F401
    blaze_order, blaze_efficiency,
)
from . import rcwa  # noqa: E402,F401
from . import glass  # noqa: E402,F401
from . import physical  # noqa: E402,F401
from .thermal import (  # noqa: E402,F401
    at_temperature, thermal_defocus, thermal_text, heat_table,
    thermal_model,
)
from .expansion import (  # noqa: E402,F401
    TransverseExpansion, transverse_expansion,
    ChromaticExpansion, chromatic_expansion,
)
_LIBRARY_NAMES = ("Library", "Catalog", "LibMaterial", "LibLens",
                  "Lens", "library")


def __getattr__(name):
    # catalog-store names resolve lazily (PEP 562) so that
    # `python -m rayopt_tpu.io.library` does not find the module
    # pre-imported in sys.modules (runpy RuntimeWarning); Lens is the
    # reference name for the stock-lens record (library_items.py:78)
    if name in _LIBRARY_NAMES:
        import importlib
        mod = importlib.import_module(__name__ + ".io.library")
        if name == "library":
            return mod
        return getattr(mod, "LibLens" if name == "Lens" else name)
    raise AttributeError("module %r has no attribute %r"
                         % (__name__, name))

__version__ = "0.1.0"
