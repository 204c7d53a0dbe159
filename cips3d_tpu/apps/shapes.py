"""3D shape extraction: voxelize the NeRF density field → .mrc volume.

Counterpart of `exp/pigan/scripts/extract_shapes.py:13-92`: sample an N^3
grid inside a cube, evaluate the SIREN's sigma head in chunks (with optional
style truncation), and write an MRC volume ready for marching cubes.

The MRC writer is a minimal pure-numpy implementation of the MRC2014 format
(1024-byte header, mode 2 float32), so no external mrcfile dependency is
needed.
"""

from __future__ import annotations

import struct
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cips3d_tpu.models.generator import GeneratorNerfINR, sample_zs


def create_voxel_grid(n: int = 256, sidelength: float = 0.24) -> np.ndarray:
    """(n^3, 3) grid covering the NeRF's box (`extract_shapes.py:13-36`
    create_samples)."""
    lin = np.linspace(-sidelength / 2, sidelength / 2, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def sample_sigma_volume(
    params,
    generator: GeneratorNerfINR,
    seed: int = 0,
    n: int = 128,
    sidelength: float = 0.24,
    chunk: int = 65536,
    psi: float = 0.7,
    styles: Optional[dict] = None,
) -> np.ndarray:
    """Evaluate sigma on an n^3 grid (`extract_shapes.py:38-63`
    sample_generator): chunked SIREN eval, truncation at ``psi``."""
    from cips3d_tpu.apps.render import compute_styles

    if styles is None:
        zs = sample_zs(jax.random.PRNGKey(seed), 1, generator.cfg)
        styles = compute_styles(params, generator, zs, psi=psi)

    grid = create_voxel_grid(n, sidelength)
    num = grid.shape[0]
    pad = (-num) % chunk
    grid_p = np.concatenate([grid, np.zeros((pad, 3), np.float32)]) if pad else grid
    chunks = grid_p.reshape(-1, chunk, 3)

    @jax.jit
    def eval_chunk(pts):
        out = generator.apply(
            params,
            pts[None],
            styles,
            method=lambda m, p, s: m.siren(p, s),
        )
        return out[0, :, -1]  # sigma channel

    sigmas = np.concatenate([np.asarray(eval_chunk(jnp.asarray(c))) for c in chunks])
    return sigmas[:num].reshape(n, n, n)


def write_mrc(path: str, volume: np.ndarray, voxel_size: float = 1.0) -> None:
    """Minimal MRC2014 writer: mode 2 (float32) volume."""
    vol = np.ascontiguousarray(volume, np.float32)
    nz, ny, nx = vol.shape
    header = bytearray(1024)
    struct.pack_into("<3i", header, 0, nx, ny, nz)          # NX NY NZ
    struct.pack_into("<i", header, 12, 2)                   # MODE 2 = float32
    struct.pack_into("<3i", header, 28, nx, ny, nz)         # MX MY MZ
    struct.pack_into(
        "<3f", header, 40, nx * voxel_size, ny * voxel_size, nz * voxel_size
    )                                                        # CELLA
    struct.pack_into("<3f", header, 52, 90.0, 90.0, 90.0)    # CELLB
    struct.pack_into("<3i", header, 64, 1, 2, 3)             # MAPC MAPR MAPS
    struct.pack_into(
        "<3f", header, 76, float(vol.min()), float(vol.max()), float(vol.mean())
    )                                                        # DMIN DMAX DMEAN
    header[208:212] = b"MAP "                                # MAP stamp
    header[212:216] = b"\x44\x44\x00\x00"                    # little-endian stamp
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(vol.tobytes())


def read_mrc(path: str) -> np.ndarray:
    """Read back a mode-2 MRC volume (for tests/tools)."""
    with open(path, "rb") as f:
        header = f.read(1024)
        nx, ny, nz = struct.unpack_from("<3i", header, 0)
        mode = struct.unpack_from("<i", header, 12)[0]
        if mode != 2:
            raise ValueError(f"unsupported MRC mode {mode}")
        data = np.frombuffer(f.read(), np.float32)
    return data.reshape(nz, ny, nx)


def extract_shape(
    params,
    generator: GeneratorNerfINR,
    out_path: str,
    seed: int = 0,
    n: int = 128,
    sidelength: float = 0.24,
    psi: float = 0.7,
) -> np.ndarray:
    """Full pipeline: sigma volume → .mrc (`extract_shapes.py:66-92`)."""
    vol = sample_sigma_volume(params, generator, seed=seed, n=n, sidelength=sidelength, psi=psi)
    write_mrc(out_path, vol)
    return vol
