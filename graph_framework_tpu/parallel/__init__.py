"""Device-mesh sharding of ray ensembles."""

from graph_framework_tpu.parallel.mesh import (  # noqa: F401
    ray_mesh,
    shard_rays,
    replicate,
    sharded_trace_fn,
)
