from swarm_tpu.geom.world import (  # noqa: F401
    BEDROOM_WALLS,
    cast_rays,
    make_rect_room,
    ray_segment_t,
)
