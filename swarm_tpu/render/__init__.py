from swarm_tpu.render.raster2d import (  # noqa: F401
    RenderTheme,
    render_ascii,
    render_map,
    render_points,
    save_png,
)
