"""Plain-text metric logger + offline plotting.

Counterpart of tl2's textlogger used throughout the reference loop
(`exp/cips3d/scripts/train.py:493-511,545`; offline plotting at
`scripts/plot_fid.py:8-54`): every scalar gets one append-only text file
``textdir/<prefix>.<group>.<name>.log`` with "step value" lines, so metrics
survive crashes and can be re-plotted at any time.
"""

from __future__ import annotations

import collections
import os
from typing import Dict, Mapping, Tuple


class TextLogger:
    def __init__(self, textdir: str):
        self.textdir = textdir
        os.makedirs(textdir, exist_ok=True)
        self._files = {}

    def _file(self, name: str):
        if name not in self._files:
            self._files[name] = open(os.path.join(self.textdir, f"{name}.log"), "a", buffering=1)
        return self._files[name]

    def log_scalar(self, name: str, step: int, value: float):
        self._file(name).write(f"{step}: {float(value):.6g}\n")

    def log_dict(self, summary: Mapping[str, Mapping[str, float]], prefix: str, step: int):
        """Nested {group: {name: value}} → one file per metric
        (`summary_defaultdict2txtfig` analogue)."""
        for group, metrics in summary.items():
            for name, value in metrics.items():
                self.log_scalar(f"{prefix}.{group}.{name}", step, value)

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


def read_log(path: str) -> Tuple[list, list]:
    """Parse a textlogger file into (steps, values)."""
    steps, values = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            s, v = line.split(":")
            steps.append(int(s))
            values.append(float(v))
    return steps, values


def plot_logs(textdir: str, out_png: str, pattern: str = "") -> int:
    """Plot all (matching) metric files into one figure
    (`scripts/plot_fid.py` analogue).  Returns the number of curves."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(
        f for f in os.listdir(textdir) if f.endswith(".log") and pattern in f
    )
    if not files:
        return 0
    fig, ax = plt.subplots(figsize=(8, 5))
    for f in files:
        steps, values = read_log(os.path.join(textdir, f))
        if steps:
            ax.plot(steps, values, label=f[:-4])
    ax.legend(fontsize=6)
    ax.set_xlabel("step")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return len(files)


def summary_defaultdict() -> Dict[str, Dict[str, float]]:
    return collections.defaultdict(dict)
