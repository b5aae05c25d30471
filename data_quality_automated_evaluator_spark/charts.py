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


def _esc(s: str) -> str:
    """XML-escape interpolated text (titles / axis labels can carry
    arbitrary column names — '&' or '<' would corrupt the SVG)."""
    from xml.sax.saxutils import escape

    return escape(str(s))


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
        f'font-weight="bold">{_esc(title)}</text>',
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
            f'<text x="{_PAD_L}" y="{y_off + _SVG_H - 8}">'
            f'{_esc(x_labels[0])}</text>'
        )
        out.append(
            f'<text x="{_SVG_W - _PAD_R}" y="{y_off + _SVG_H - 8}" '
            f'text-anchor="end">{_esc(x_labels[-1])}</text>'
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


# --------------------------------------------------------------------------
# stdlib PNG rasterizer (functions/png.py encoder; no matplotlib needed)
# --------------------------------------------------------------------------

# procedural 3x5 glyphs for numeric labels (rows of 3 bits, MSB left)
_DIGIT_FONT = {
    "0": [0b111, 0b101, 0b101, 0b101, 0b111],
    "1": [0b010, 0b110, 0b010, 0b010, 0b111],
    "2": [0b111, 0b001, 0b111, 0b100, 0b111],
    "3": [0b111, 0b001, 0b111, 0b001, 0b111],
    "4": [0b101, 0b101, 0b111, 0b001, 0b001],
    "5": [0b111, 0b100, 0b111, 0b001, 0b111],
    "6": [0b111, 0b100, 0b111, 0b101, 0b111],
    "7": [0b111, 0b001, 0b010, 0b010, 0b010],
    "8": [0b111, 0b101, 0b111, 0b101, 0b111],
    "9": [0b111, 0b101, 0b111, 0b001, 0b111],
    ".": [0b000, 0b000, 0b000, 0b000, 0b010],
    "-": [0b000, 0b000, 0b111, 0b000, 0b000],
    "+": [0b000, 0b010, 0b111, 0b010, 0b000],
    "e": [0b000, 0b111, 0b110, 0b100, 0b111],
}


def _blit_text(canvas, y: int, x: int, s: str, color=(60, 60, 60)) -> None:
    """Draw numeric text with the 3x5 font (unknown chars advance only)."""
    import numpy as np

    h, w = canvas.shape[:2]
    cx = x
    for chx in s:
        glyph = _DIGIT_FONT.get(chx)
        if glyph is not None:
            for gy, bits in enumerate(glyph):
                for gx in range(3):
                    if bits & (0b100 >> gx):
                        py, px = y + gy, cx + gx
                        if 0 <= py < h and 0 <= px < w:
                            canvas[py, px] = color
        cx += 4


def _draw_line(canvas, x0, y0, x1, y1, color) -> None:
    """Dense-sampled segment draw (numpy; good enough at chart scale)."""
    import numpy as np

    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    t = np.linspace(0.0, 1.0, n + 1)
    xs = np.clip((x0 + (x1 - x0) * t).round().astype(int), 0, canvas.shape[1] - 1)
    ys = np.clip((y0 + (y1 - y0) * t).round().astype(int), 0, canvas.shape[0] - 1)
    canvas[ys, xs] = color


def _render_canvas(data: pd.DataFrame, evaluations: list[ColumnEvaluation]):
    """Rasterize the chart grid to an HxWx3 uint8 canvas (shared by the
    PNG and JPEG exporters): per-evaluation panel with frame, shaded
    outlier band, series polyline and numeric min/max tick labels.
    Panel titles (arbitrary text) live in the SVG/markdown — the
    procedural font covers numerals only, honestly."""
    import numpy as np

    n = max(len(evaluations), 1)
    H, W = _SVG_H * n, _SVG_W
    canvas = np.full((H, W, 3), 255, dtype=np.uint8)
    for i, ev in enumerate(evaluations):
        y_off = i * _SVG_H
        ys = [
            None if pd.isna(v) else float(v)
            for v in pd.to_numeric(data[ev.column], errors="coerce")
        ]
        vals = [v for v in ys if v is not None]
        lo = min(vals) if vals else 0.0
        hi = max(vals) if vals else 1.0
        lb, ub = ev.chart_bounds
        if lb is not None and not pd.isna(lb):
            lo = min(lo, float(lb))
        if ub is not None and not pd.isna(ub):
            hi = max(hi, float(ub))
        if hi == lo:
            hi = lo + 1.0
        plot_w = W - _PAD_L - _PAD_R
        plot_h = _SVG_H - _PAD_T - _PAD_B
        top, left = y_off + _PAD_T, _PAD_L

        def sx(j):
            return left + plot_w * j / max(len(ys) - 1, 1)

        def sy(v):
            return top + plot_h * (1 - (v - lo) / (hi - lo))

        # frame
        canvas[top, left:left + plot_w] = (200, 200, 200)
        canvas[top + plot_h, left:left + plot_w] = (200, 200, 200)
        canvas[top:top + plot_h + 1, left] = (200, 200, 200)
        canvas[top:top + plot_h + 1, left + plot_w - 1] = (200, 200, 200)
        # outlier band (alpha-blended grey, reference highlight_outliers)
        if lb is not None and ub is not None and not pd.isna(lb) and not pd.isna(ub):
            b_top = int(max(sy(float(ub)), top))
            b_bot = int(min(sy(float(lb)), top + plot_h))
            if b_bot > b_top:
                region = canvas[b_top:b_bot, left + 1:left + plot_w - 1].astype(np.int32)
                canvas[b_top:b_bot, left + 1:left + plot_w - 1] = (
                    (region * 88 + np.array([128, 128, 128]) * 12) // 100
                ).astype(np.uint8)
        # series polyline
        pts = [(sx(j), sy(v)) for j, v in enumerate(ys) if v is not None]
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            _draw_line(canvas, x0, y0, x1, y1, (70, 70, 70))
        # numeric min/max tick labels
        _blit_text(canvas, top - 2, 4, f"{hi:.4g}")
        _blit_text(canvas, top + plot_h - 4, 4, f"{lo:.4g}")
    return canvas


def render_png(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """Dependency-free PNG chart export via the stdlib codec
    (functions/png.py) over the shared rasterizer."""
    from .functions.png import encode_png

    with open(path, "wb") as fh:
        fh.write(encode_png(_render_canvas(data, evaluations)))
    return path


def render_jpeg(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """JPEG chart export (reference plot.py:67-71 format parity) via the
    baseline encoder in functions/jpeg.py over the shared rasterizer;
    4:4:4 at quality 92 keeps the 1-px chart lines crisp."""
    from .functions.jpeg import encode_jpeg

    with open(path, "wb") as fh:
        fh.write(encode_jpeg(_render_canvas(data, evaluations), quality=92))
    return path


def render_webp(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """Lossless WebP chart export (reference plot.py:67-71 format
    parity) via the stdlib VP8L codec (functions/webp.py) over the
    shared rasterizer — LZ77 runs over the flat chart background make
    this the smallest raster export of the set."""
    from .functions.webp import encode_webp

    with open(path, "wb") as fh:
        fh.write(encode_webp(_render_canvas(data, evaluations)))
    return path


def render_pdf(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """PDF chart export (reference plot.py:67-71 format parity): a
    minimal single-page PDF whose page image is the chart raster encoded
    by our own baseline JPEG encoder and embedded verbatim as a
    ``/DCTDecode`` image XObject — the standard way JPEG travels inside
    PDF, so any conforming viewer renders it with zero extra codecs.
    Byte offsets in the xref table are computed exactly; output is
    deterministic."""
    from .functions.jpeg import encode_jpeg

    canvas = _render_canvas(data, evaluations)
    h, w = canvas.shape[:2]
    jpg = encode_jpeg(canvas, quality=92)
    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
         f"/Resources << /XObject << /Im0 4 0 R >> >> "
         f"/Contents 5 0 R >>").encode(),
        (f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
         f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
         f"/Length {len(jpg)} >>").encode()
        + b"\nstream\n" + jpg + b"\nendstream",
        f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return path


def render_eps(
    data: pd.DataFrame, evaluations: list[ColumnEvaluation], path: str
) -> str:
    """EPS chart export (the last of the reference's kaleido static
    formats, plot.py:67-71: png/jpeg/webp/svg/pdf/eps): a Level-2
    PostScript ``colorimage`` whose hex payload is the shared raster,
    top row first via the ``[W 0 0 -H 0 H]`` image matrix. Pure stdlib,
    deterministic, DSC-compliant (%%BoundingBox, hex lines < 255
    chars), so any PostScript interpreter renders it as-is."""
    import binascii

    canvas = _render_canvas(data, evaluations)
    h, w = canvas.shape[:2]
    hexdata = binascii.hexlify(canvas.tobytes()).decode("ascii")
    lines = [
        "%!PS-Adobe-3.0 EPSF-3.0",
        f"%%BoundingBox: 0 0 {w} {h}",
        "%%Pages: 1",
        "%%LanguageLevel: 2",
        "%%EndComments",
        "%%Page: 1 1",
        "gsave",
        f"/picstr {w * 3} string def",
        f"{w} {h} scale",
        f"{w} {h} 8 [{w} 0 0 -{h} 0 {h}]",
        "{currentfile picstr readhexstring pop} false 3 colorimage",
        *[hexdata[i : i + 76] for i in range(0, len(hexdata), 76)],
        "grestore",
        "showpage",
        "%%EOF",
        "",
    ]
    with open(path, "w", encoding="ascii") as fh:
        fh.write("\n".join(lines))
    return path


def make_charts(
    data: pd.DataFrame,
    evaluations: list[ColumnEvaluation],
    out_dir: str,
    group_name: str,
    fmt: str | None = None,
) -> str:
    """Render charts for one column group; returns the artifact path.

    ``fmt``: "png" (matplotlib, stdlib fallback), "jpeg" (stdlib
    baseline encoder), "webp" (stdlib VP8L lossless), "pdf"
    (DCTDecode-embedded page), "eps" (Level-2 colorimage), "svg"
    (stdlib), or "json" (data only); default picks png when matplotlib
    is available, else svg. The reference's full static export set
    (png/jpeg/webp/svg/pdf/eps, plot.py:67-71) is covered.
    """
    os.makedirs(out_dir, exist_ok=True)
    x = data[TIME_INTERVAL_COL]
    if fmt is None:
        fmt = "png" if HAVE_MPL else "svg"
    if fmt in ("jpeg", "jpg"):
        return render_jpeg(
            data, evaluations, os.path.join(out_dir, f"{group_name}.jpeg")
        )
    if fmt == "webp":
        return render_webp(
            data, evaluations, os.path.join(out_dir, f"{group_name}.webp")
        )
    if fmt == "pdf":
        return render_pdf(
            data, evaluations, os.path.join(out_dir, f"{group_name}.pdf")
        )
    if fmt == "eps":
        return render_eps(
            data, evaluations, os.path.join(out_dir, f"{group_name}.eps")
        )
    if fmt == "png" and not HAVE_MPL:
        # real PNG without matplotlib: the stdlib rasterizer (series +
        # outlier band + numeric ticks; titles stay in the markdown/SVG)
        return render_png(
            data, evaluations, os.path.join(out_dir, f"{group_name}.png")
        )

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
