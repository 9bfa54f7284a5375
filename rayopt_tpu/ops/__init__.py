from .tables import SurfaceTable  # noqa: F401
from .surfaces import (  # noqa: F401
    surface_sag, surface_normal, intercept, refract, propagate_surface,
)
from .geometric import trace_rays  # noqa: F401
