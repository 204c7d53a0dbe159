from cips3d_tpu.ops.diffaug import diff_augment  # noqa: F401
from cips3d_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu  # noqa: F401
from cips3d_tpu.ops.upfirdn2d import make_kernel, upfirdn2d  # noqa: F401
