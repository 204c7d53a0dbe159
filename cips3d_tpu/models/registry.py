"""Model registry entries.

The reference resolves yaml model nodes through a registry
(`MODEL_REGISTRY`/`build_model`, `exp/cips3d/models/generator.py:380,1158`,
`exp/cips3d/configs/ffhq_exp.yaml:43-46`); these registrations give our
`cips3d_tpu.config.build_model` the same capability.  Import this module (or
`cips3d_tpu.models`) before resolving configs.
"""

from __future__ import annotations

import dataclasses

from cips3d_tpu.config.config import register
from cips3d_tpu.models.discriminator import (
    Discriminator,
    DiscriminatorMultiScale,
    DiscriminatorMultiScaleAux,
)
from cips3d_tpu.models.generator import GeneratorConfig, GeneratorNerfINR
from cips3d_tpu.models.generator_diffcam import GeneratorDiffcam
from cips3d_tpu.models.pigan import ImplicitGenerator3d, ProgressiveDiscriminator


def _gen_cfg(kwargs) -> GeneratorConfig:
    fields = {f.name for f in dataclasses.fields(GeneratorConfig)}
    return GeneratorConfig(**{k: v for k, v in kwargs.items() if k in fields})


@register("cips3d_tpu.models.GeneratorNerfINR")
def build_generator(**kwargs):
    dtype = kwargs.pop("dtype", None)
    extra = {"dtype": dtype} if dtype is not None else {}
    return GeneratorNerfINR(cfg=_gen_cfg(kwargs), **extra)


@register("cips3d_tpu.models.GeneratorNerfINR_freeze_NeRF")
def build_generator_freeze(**kwargs):
    kwargs["freeze_nerf"] = True
    return build_generator(**kwargs)


@register("cips3d_tpu.models.GeneratorDiffcam")
def build_generator_diffcam(**kwargs):
    return GeneratorDiffcam(cfg=_gen_cfg(kwargs))


@register("cips3d_tpu.models.Discriminator")
def build_discriminator_fixed(**kwargs):
    return Discriminator(**kwargs)


@register("cips3d_tpu.models.DiscriminatorMultiScale")
def build_discriminator_ms(**kwargs):
    return DiscriminatorMultiScale(**kwargs)


@register("cips3d_tpu.models.DiscriminatorMultiScaleAux")
def build_discriminator(**kwargs):
    return DiscriminatorMultiScaleAux(**kwargs)


@register("cips3d_tpu.models.pigan.ImplicitGenerator3d")
def build_pigan_generator(**kwargs):
    return ImplicitGenerator3d(**kwargs)


@register("cips3d_tpu.models.pigan.ProgressiveDiscriminator")
def build_pigan_discriminator(**kwargs):
    return ProgressiveDiscriminator(**kwargs)
