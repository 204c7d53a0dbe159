"""Runtime platform selection for CLI entry points.

This environment's sitecustomize may pin ``jax_platforms`` (a config value
beats the ``JAX_PLATFORMS`` env var), so CLIs honor their own env vars and
re-apply the config before the backend initializes:

  CIPS3D_PLATFORM=cpu        run on local CPU instead of the default
  CIPS3D_CPU_DEVICES=8       simulate N CPU devices (sharding tests/dryruns)

Must be called before any jax operation (the num-devices option validates
that no backend is initialized yet).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    import jax

    platform = os.environ.get("CIPS3D_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    n = os.environ.get("CIPS3D_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))
