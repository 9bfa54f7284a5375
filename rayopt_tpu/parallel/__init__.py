from .sharding import (  # noqa: F401
    ray_mesh, shard_rays, sharded_trace, sharded_rms,
)
from .grad import trace_rms_merit, optimize_grad  # noqa: F401
