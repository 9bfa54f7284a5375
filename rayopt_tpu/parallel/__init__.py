from .sharding import (  # noqa: F401
    ray_mesh, shard_rays, sharded_trace, sharded_rms,
    sharded_spot_rms, shard_bundles, shard_components,
    sharded_pallas_trace, sharded_pallas_moments,
    sharded_pallas_spot_rms,
    sharded_df32_trace, sharded_df32_moments,
)
from .tolerancing import (  # noqa: F401
    tolerance_analysis, monte_carlo_rms, sharded_monte_carlo_rms,
    compensated_monte_carlo_rms,
    perturbed_tables, aberration_tolerance, sensitivity,
    inverse_sensitivity,
)
from .multihost import (  # noqa: F401
    farm_mesh, farmed_monte_carlo_rms,
)
from .grad import (  # noqa: F401
    trace_rms_merit, optimize_grad, optimize_system, optimize_zoom,
    optimize_multi_start,
    spot_rms,
    wavefront_rms, opd_rays, bundles_from_system,
)
from .diffraction import (  # noqa: F401
    strehl_ratio, strehl_marechal, pupil_grid, psf_grid,
    mtf_radial,
)
