from cips3d_tpu.ops.pallas.film_mlp import (  # noqa: F401
    film_mlp_forward,
    siren_forward_pallas,
)
