"""Shape-tracing debug mode — the `VerboseModel.forward_verbose` analogue.

The reference prints per-layer shapes when `global_cfg.tl_debug` is set
(`exp/cips3d/models/generator.py:273-312`, `discriminator.py:368-399`,
SURVEY §5 "tracing").  Under XLA everything is traced once, so shape logging
happens naturally at trace time: `trace(...)` is free when disabled and
prints each compiled variant exactly once when enabled.

Usage:
    from cips3d_tpu.utils import debug
    debug.enable(True)                    # or --opts debug_shapes true
    with debug.shape_debug():             # scoped variant
        model.apply(...)
"""

from __future__ import annotations

import contextlib

_ENABLED = False


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def shape_debug():
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = prev


def trace(name: str, *arrays, **named) -> None:
    """Print `name: shape dtype` for each array at trace time (no-op when
    disabled; zero runtime cost either way — shapes are static)."""
    if not _ENABLED:
        return
    parts = []
    for a in arrays:
        parts.append(_fmt(a))
    for k, a in named.items():
        parts.append(f"{k}={_fmt(a)}")
    print(f"[shape] {name}: {', '.join(parts)}", flush=True)


def _fmt(a) -> str:
    shape = getattr(a, "shape", None)
    dtype = getattr(a, "dtype", None)
    if shape is None:
        return repr(a)
    return f"{tuple(shape)}:{dtype}"
