from swarm_tpu.ops.bresenham import bresenham_cells, chebyshev_cells  # noqa: F401
from swarm_tpu.ops.raster import (  # noqa: F401
    logodds_raster,
    parity_raster,
    tri_state_view,
    world_to_grid,
)
