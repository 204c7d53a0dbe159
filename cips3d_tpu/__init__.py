"""cips3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D-aware GAN framework.

A from-scratch rebuild of the capabilities of CIPS-3D (PeterouZh/CIPS-3D):
a style-modulated FiLM-SIREN NeRF backbone renders a low-dimensional feature
image by volume rendering; a CIPS-style per-pixel modulated-FC INR decoder maps
the feature image to RGB; a StyleGAN2 multi-scale discriminator (plus an
auxiliary discriminator on the NeRF's own RGB) trains the generator
adversarially with progressive resolution, R1 regularization, DiffAug and
generator EMA.

Everything is functional JAX: parameters are pytrees, randomness is explicit
`jax.random` keys, multi-device execution is a `jax.sharding.Mesh` + `jit`
with sharding annotations (collectives ride ICI), and the hot NeRF point-MLP /
volume-rendering path has Pallas TPU kernels.

Subpackages
-----------
- ``core``     ray/camera math, volume rendering, EMA (reference: exp/comm/comm_utils.py,
               exp/pigan/pigan_utils.py)
- ``ops``      upfirdn2d, fused bias+leaky-relu, DiffAugment, Pallas kernels
               (reference: exp/comm/op/, exp/cips3d/models/diffaug.py)
- ``models``   generator / discriminator stacks (reference: exp/cips3d/models/)
- ``parallel`` mesh + sharding helpers (reference DDP: exp/cips3d/scripts/train.py:41-53)
- ``train``    losses, schedules, train step, loop (reference: exp/cips3d/scripts/train.py)
- ``data``     StyleGAN-zip dataset + dataset tool (reference: scripts/dataset_tool.py)
- ``eval``     image dumping + FID (reference: exp/cips3d/scripts/{gen_images,eval_fid}.py)
- ``config``   YAML command nodes with `base:` inheritance + dotted CLI overrides
- ``apps``     rendering, model interpolation, inversion, shape extraction
"""

__version__ = "0.1.0"
