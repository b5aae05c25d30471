"""Chart generation (SURVEY §2.8 K2).

The reference renders per-column Plotly subplot grids with outlier-band
shapes (plot.py:9-71). Rendering tiers, best available first:

- with matplotlib installed → PNG per column group (series + outlier
  bounds shading);
- otherwise → **stdlib SVG**: a real image artifact with the series
  polyline, shaded outlier-bound band, per-subplot titles and min/max
  axis labels — no third-party dependency, byte-deterministic;
- ``fmt="json"`` → a deterministic ``charts.json`` capturing exactly
  what would be drawn (series, bounds, titles) for data consumers.
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


_SVG_W, _SVG_H = 720, 170          # per-subplot panel size
_PAD_L, _PAD_R, _PAD_T, _PAD_B = 52, 14, 26, 22


def _svg_panel(x_labels, y, bounds, title: str, y_off: int) -> list[str]:
    """One subplot: polyline + outlier-band rect + title + min/max ticks.
    Mirrors the reference subplot contract (plot.py:47-62: one Scatter
    trace per column, highlight_outliers rect shape over the bounds)."""
    vals = [v for v in y if v is not None]
    lo = min(vals) if vals else 0.0
    hi = max(vals) if vals else 1.0
    lb, ub = bounds
    if lb is not None:
        lo = min(lo, lb)
    if ub is not None:
        hi = max(hi, ub)
    if hi == lo:
        hi = lo + 1.0
    plot_w = _SVG_W - _PAD_L - _PAD_R
    plot_h = _SVG_H - _PAD_T - _PAD_B

    def sx(i: int) -> float:
        return _PAD_L + (plot_w * i / max(len(y) - 1, 1))

    def sy(v: float) -> float:
        return y_off + _PAD_T + plot_h * (1 - (v - lo) / (hi - lo))

    out = [
        f'<g font-family="sans-serif" font-size="10">',
        f'<rect x="{_PAD_L}" y="{y_off + _PAD_T}" width="{plot_w}" '
        f'height="{plot_h}" fill="white" stroke="#ccc"/>',
        f'<text x="{_PAD_L}" y="{y_off + _PAD_T - 8}" font-size="11" '
        f'font-weight="bold">{title}</text>',
    ]
    if lb is not None and ub is not None:
        top, bot = sy(ub), sy(lb)
        out.append(
            f'<rect class="outlier-band" x="{_PAD_L}" y="{top:.1f}" '
            f'width="{plot_w}" height="{max(bot - top, 0):.1f}" '
            f'fill="grey" opacity="0.12" stroke="#888" stroke-width="0.5" '
            f'stroke-dasharray="3,2"/>'
        )
    pts = " ".join(
        f"{sx(i):.1f},{sy(v):.1f}" for i, v in enumerate(y) if v is not None
    )
    if pts:
        out.append(
            f'<polyline points="{pts}" fill="none" stroke="#555" '
            f'stroke-width="0.9"/>'
        )
    # min/max y ticks, first/last x labels
    out.append(f'<text x="4" y="{y_off + _PAD_T + 9}">{hi:.4g}</text>')
    out.append(f'<text x="4" y="{y_off + _PAD_T + plot_h}">{lo:.4g}</text>')
    if len(x_labels):
        out.append(
            f'<text x="{_PAD_L}" y="{y_off + _SVG_H - 8}">{x_labels[0]}</text>'
        )
        out.append(
            f'<text x="{_SVG_W - _PAD_R}" y="{y_off + _SVG_H - 8}" '
            f'text-anchor="end">{x_labels[-1]}</text>'
        )
    out.append("</g>")
    return out


def render_svg(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """Stdlib SVG chart grid — one stacked subplot per evaluation, with
    the outlier bounds rendered as a shaded band (reference
    plot.py:58-62). Deterministic output, zero dependencies."""
    x_labels = [str(v) for v in data[TIME_INTERVAL_COL]]
    total_h = _SVG_H * max(len(evaluations), 1)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_SVG_W}" '
        f'height="{total_h}" viewBox="0 0 {_SVG_W} {total_h}">',
        f'<rect width="{_SVG_W}" height="{total_h}" fill="white"/>',
    ]
    for i, ev in enumerate(evaluations):
        y = [
            None if pd.isna(v) else float(v)
            for v in pd.to_numeric(data[ev.column], errors="coerce")
        ]
        parts.extend(
            _svg_panel(x_labels, y, ev.chart_bounds, ev.title, i * _SVG_H)
        )
    parts.append("</svg>")
    with open(path, "w") as fh:
        fh.write("\n".join(parts))
    return path


def make_charts(
    data: pd.DataFrame,
    evaluations: list[ColumnEvaluation],
    out_dir: str,
    group_name: str,
    fmt: str | None = None,
) -> str:
    """Render charts for one column group; returns the artifact path.

    ``fmt``: "png" (matplotlib), "svg" (stdlib), or "json" (data only);
    default picks png when matplotlib is available, else svg.
    """
    os.makedirs(out_dir, exist_ok=True)
    x = data[TIME_INTERVAL_COL]
    if fmt is None:
        fmt = "png" if HAVE_MPL else "svg"
    if fmt == "png" and not HAVE_MPL:
        # an explicit png request without matplotlib degrades to the next
        # IMAGE format, not to a data file a report would embed as a
        # broken <img>
        fmt = "svg"

    if fmt == "svg":
        return render_svg(data, evaluations, os.path.join(out_dir, f"{group_name}.svg"))

    if fmt == "png" and HAVE_MPL:  # pragma: no cover
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
