from cips3d_tpu.ops.pallas.ray_tile import (  # noqa: F401
    fused_ray_render,
)
