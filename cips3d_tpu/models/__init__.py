from cips3d_tpu.models.cips_net import CIPSNet, SinBlock  # noqa: F401
from cips3d_tpu.models.generator import (  # noqa: F401
    GeneratorConfig,
    GeneratorNerfINR,
    RenderOptions,
    sample_zs,
    truncate_styles,
)
from cips3d_tpu.models.mapping import MultiHeadMappingNetwork  # noqa: F401
from cips3d_tpu.models.nerf_net import NeRFNetwork  # noqa: F401
