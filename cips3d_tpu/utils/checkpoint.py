"""Checkpointing: directory-per-snapshot of per-module arrays + state.

Counterpart of the reference's checkpoint layout
(`exp/cips3d/scripts/train.py:56-83,242-285`): a snapshot directory holds one
file per module (generator, G_ema, discriminator, state), a copy of the
resolved config, and an info message; three trees are maintained —
``best_fid/``, rotating numbered backups (keep-N), and ``resume/``.  Finetune
mode loads weights but not optimizer state (`train.py:262-271`).

Format: each module's pytree is flattened to ``{path: ndarray}`` and written
as one ``.npz``; the tree structure is reconstructed on load from the saved
key paths, so checkpoints are plain, inspectable numpy archives (no pickle).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _set_in(nested: dict, keys: List[str], value):
    cur = nested
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


_KEY_RE = re.compile(r"\['([^']+)'\]|\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]")


def _parse_keystr(s: str) -> List[str]:
    out = []
    for m in _KEY_RE.finditer(s):
        out.append(m.group(1) or m.group(2) or m.group(3))
    return out


def save_pytree(path: str, tree) -> None:
    """Write a pytree of arrays as a single .npz."""
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_pytree(path: str) -> Any:
    """Read an .npz back into nested dicts (lists become str-keyed dicts)."""
    data = np.load(path, allow_pickle=False)
    nested: dict = {}
    for key in data.files:
        _set_in(nested, _parse_keystr(key), data[key])
    return nested


def load_pytree_like(path: str, reference) -> Any:
    """Load a checkpoint and graft values onto the structure of ``reference``
    (keeps original dtypes/devices semantics to the caller)."""
    loaded = load_pytree(path)

    def pick(node, keys):
        cur = loaded
        for k in keys:
            cur = cur[k]
        return cur

    out_leaves = []
    for path_keys, leaf in jax.tree_util.tree_leaves_with_path(reference):
        keys = _parse_keystr(jax.tree_util.keystr(path_keys))
        val = pick(loaded, keys)
        if val.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch at {keys}: ckpt {val.shape} vs model {np.shape(leaf)}")
        # read dtype from the leaf attribute: np.asarray(device_leaf) would
        # DOWNLOAD every parameter through the (slow remote) device link just
        # to learn its dtype — observed as minutes-long checkpoint loads
        dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        out_leaves.append(val.astype(dtype))
    treedef = jax.tree_util.tree_structure(reference)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


class CheckpointManager:
    """best/backup/resume trees with rotating keep-N backups
    (`train.py:548-571`, `MaxToKeep` at `train.py:65-66`)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = ckpt_dir
        self.max_to_keep = max_to_keep
        os.makedirs(ckpt_dir, exist_ok=True)

    # ---------------- save ----------------

    def save_snapshot(
        self,
        name: str,
        modules: Dict[str, Any],
        state: Optional[Dict[str, Any]] = None,
        info_msg: str = "",
        config_text: Optional[str] = None,
    ) -> str:
        """Write one snapshot dir with per-module npz files."""
        path = os.path.join(self.ckpt_dir, name)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for mod_name, tree in modules.items():
            save_pytree(os.path.join(tmp, f"{mod_name}.npz"), tree)
        if state is not None:
            with open(os.path.join(tmp, "state.json"), "w") as f:
                json.dump(state, f, indent=2)
        if info_msg:
            with open(os.path.join(tmp, "info.txt"), "w") as f:
                f.write(info_msg)
        if config_text:
            with open(os.path.join(tmp, "config_command.yaml"), "w") as f:
                f.write(config_text)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return path

    def save_backup(self, modules, state=None, info_msg="", config_text=None) -> str:
        """Numbered rotating backup (keep newest N)."""
        existing = sorted(
            int(d.split("_")[1]) for d in os.listdir(self.ckpt_dir)
            if d.startswith("ckpt_") and d.split("_")[1].isdigit()
        )
        nxt = (existing[-1] + 1) if existing else 0
        path = self.save_snapshot(f"ckpt_{nxt:08d}", modules, state, info_msg, config_text)
        for old in existing[: max(0, len(existing) + 1 - self.max_to_keep)]:
            shutil.rmtree(os.path.join(self.ckpt_dir, f"ckpt_{old:08d}"), ignore_errors=True)
        return path

    # ---------------- load ----------------

    def load_snapshot(self, name: str, modules: Dict[str, Any]) -> Dict[str, Any]:
        """Load per-module trees shaped like the provided references."""
        path = os.path.join(self.ckpt_dir, name)
        out = {}
        for mod_name, ref in modules.items():
            out[mod_name] = load_pytree_like(os.path.join(path, f"{mod_name}.npz"), ref)
        return out

    def load_state(self, name: str) -> Dict[str, Any]:
        with open(os.path.join(self.ckpt_dir, name, "state.json")) as f:
            return json.load(f)

    def has_snapshot(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.ckpt_dir, name))
