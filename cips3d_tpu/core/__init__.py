from cips3d_tpu.core import ema, points, rays, trajectories, volume  # noqa: F401
