from .tables import SurfaceTable, make_table  # noqa: F401
from .surfaces import (  # noqa: F401
    surface_sag, surface_normal, intercept, refract, propagate_surface,
)
from .geometric import (  # noqa: F401
    trace_rays, trace_rays_final, trace_components_final,
    trace_rays_final_multi, trace_rays_final_fast,
)
from .kernels import specialize, SurfaceSpec  # noqa: F401
from . import df32  # noqa: F401
