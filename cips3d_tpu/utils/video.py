"""Self-contained video writing: MJPEG-AVI with zero codec dependencies.

The reference writes demo videos with imageio+ffmpeg / skvideo
(`exp/cips3d/models/st_web.py:445-486`, `tl2` video helpers).  This
environment has imageio but no ffmpeg binary, so mp4 encoding is
unavailable; instead of gating video output on a missing codec we write
Motion-JPEG inside an AVI RIFF container — every frame is a baseline JPEG
(PIL encodes those natively), and MJPEG-AVI plays in VLC/mpv/ffplay/
QuickTime without extra codecs.  `write_video` prefers mp4 via
imageio-ffmpeg when that is importable and silently falls back to `.avi`.

The container writer below implements the minimal AVI 1.0 spec: RIFF('AVI ')
with an 'hdrl' list (avih + one 'vids'/'MJPG' stream), a 'movi' list of
'00dc' frame chunks, and an 'idx1' keyframe index.
"""

from __future__ import annotations

import io
import struct
from typing import Iterable, List

import numpy as np

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def encode_jpeg(frame: np.ndarray, quality: int = 92) -> bytes:
    """HWC uint8 RGB -> baseline JPEG bytes (PIL)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(frame, dtype=np.uint8)).save(
        buf, format="JPEG", quality=quality, subsampling=0
    )
    return buf.getvalue()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(
    frames: Iterable[np.ndarray],
    out_path: str,
    fps: int = 25,
    quality: int = 92,
) -> str:
    """Write HWC uint8 RGB frames as an MJPEG AVI.  Returns ``out_path``."""
    jpegs: List[bytes] = [encode_jpeg(f, quality) for f in frames]
    if not jpegs:
        raise ValueError("no frames")
    first = next(iter(frames)) if isinstance(frames, (list, tuple)) else None
    if first is not None:
        h, w = first.shape[:2]
    else:  # frames was a generator: recover dims from the first JPEG
        from PIL import Image

        w, h = Image.open(io.BytesIO(jpegs[0])).size

    max_bytes = max(len(j) for j in jpegs)
    n = len(jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1_000_000 / fps),  # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        AVIF_HASINDEX,         # dwFlags
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,            # dwReserved
    )

    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids",
        b"MJPG",
        0,                     # dwFlags
        0, 0,                  # wPriority, wLanguage
        0,                     # dwInitialFrames
        1,                     # dwScale
        fps,                   # dwRate
        0,                     # dwStart
        n,                     # dwLength (frames)
        max_bytes,             # dwSuggestedBufferSize
        -1,                    # dwQuality
        0,                     # dwSampleSize
        0, 0, w, h,            # rcFrame
    )

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        w,
        h,
        1,                     # biPlanes
        24,                    # biBitCount
        b"MJPG",               # biCompression
        w * h * 3,             # biSizeImage
        0, 0, 0, 0,
    )

    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = b""
    index_entries = []
    offset = 4  # convention: offsets relative to the 'movi' fourcc
    for j in jpegs:
        ch = _chunk(b"00dc", j)
        index_entries.append((offset, len(j)))
        movi_payload += ch
        offset += len(ch)
    movi = _list(b"movi", movi_payload)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, size)
        for off, size in index_entries
    )

    riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    with open(out_path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return out_path


def read_mjpeg_avi(path: str) -> List[np.ndarray]:
    """Decode the frames back (test helper): walks '00dc' chunks."""
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    frames = []
    i = data.index(b"movi") + 4
    end = len(data)
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        if fourcc == b"00dc":
            jpeg = data[i + 8 : i + 8 + size]
            frames.append(np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB")))
        elif fourcc in (b"idx1", b"LIST"):
            break
        i += 8 + size + (size % 2)
    return frames


def write_video(frames, out_path: str, fps: int = 25) -> str:
    """Write frames to ``out_path``; mp4 via imageio-ffmpeg when available,
    else MJPEG-AVI (extension swapped to .avi).  Returns the actual path."""
    frames = list(frames)
    if out_path.endswith(".mp4"):
        try:
            import imageio_ffmpeg  # noqa: F401  (imageio mp4 needs the binary)
            import imageio

            with imageio.get_writer(out_path, fps=fps) as w:
                for f in frames:
                    w.append_data(np.asarray(f, dtype=np.uint8))
            return out_path
        except Exception:
            out_path = out_path[: -len(".mp4")] + ".avi"
    return write_mjpeg_avi(frames, out_path, fps=fps)
