"""Chart generation (SURVEY §2.8 K2) — gated on an optional plotting lib.

The reference renders per-column Plotly subplot grids with outlier-band
shapes (plot.py:9-71). This container ships neither plotly nor
matplotlib, so chart generation degrades gracefully:

- with matplotlib installed → PNG per column group (series + outlier
  bounds shading);
- without → a deterministic ``charts.json`` capturing exactly what
  would be drawn (series, bounds, titles), so reports link to data and
  the rendering seam is one function.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from .functions.aggregates import TIME_INTERVAL_COL
from .operators.evaluate import ColumnEvaluation

try:  # pragma: no cover - depends on environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False


def make_charts(
    data: pd.DataFrame,
    evaluations: list[ColumnEvaluation],
    out_dir: str,
    group_name: str,
) -> str:
    """Render (or serialize) charts for one column group; returns the
    artifact path (png with matplotlib, json otherwise)."""
    os.makedirs(out_dir, exist_ok=True)
    x = data[TIME_INTERVAL_COL]

    if HAVE_MPL:  # pragma: no cover
        n = len(evaluations)
        fig, axes = plt.subplots(n, 1, figsize=(10, 2.5 * n), squeeze=False)
        for ax, ev in zip(axes[:, 0], evaluations):
            y = pd.to_numeric(data[ev.column], errors="coerce")
            ax.plot(x, y, linewidth=0.8)
            lb, ub = ev.chart_bounds
            if lb is not None and ub is not None:
                ax.axhspan(float(lb), float(ub), alpha=0.15)
            ax.set_title(ev.title, fontsize=9)
        path = os.path.join(out_dir, f"{group_name}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    payload = {
        "group": group_name,
        "x": [str(v) for v in x],
        "series": [
            {
                "title": ev.title,
                "column": ev.column,
                "y": [None if pd.isna(v) else float(v)
                      for v in pd.to_numeric(data[ev.column], errors="coerce")],
                "bounds": [
                    None if b is None or pd.isna(b) else float(b)
                    for b in ev.chart_bounds
                ],
            }
            for ev in evaluations
        ],
    }
    path = os.path.join(out_dir, f"{group_name}.json")
    with open(path, "w") as fh:
        json.dump(payload, fh)
    return path
