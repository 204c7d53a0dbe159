from cips3d_tpu.eval.fid import (  # noqa: F401
    activation_statistics,
    eval_fid,
    frechet_distance,
    kid_mmd,
)
from cips3d_tpu.eval.images import (  # noqa: F401
    gen_images,
    sample_images,
    save_image_grid,
    setup_evaluation,
)
