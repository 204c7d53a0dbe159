from cips3d_tpu.apps.interpolation import inr_layer_swapping, model_interpolation_demo  # noqa: F401
from cips3d_tpu.apps.inversion import project_image  # noqa: F401
from cips3d_tpu.apps.render import (  # noqa: F401
    render_chunked,
    render_multiview,
    render_trajectory_video,
)
from cips3d_tpu.apps.shapes import extract_shape, read_mrc, sample_sigma_volume, write_mrc  # noqa: F401
