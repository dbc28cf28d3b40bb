"""Plot sinks (SURVEY.md §2.1 S6).

The reference renders per-group forecast line charts with matplotlib
and saves one PNG per group (covid_simulator.py:298-319,630-651 —
three series, legend, title, per-state file; weather_pred.py:342-347,
commented actual-vs-prediction plots). This container ships no
matplotlib, so the ENGINE-side contract is made real and hermetic:

- the Spark side reduces to a bounded plot-ready table (the collect is
  GUARDED — plotting a corpus is a bug, aggregate first);
- the default renderer writes deterministic, dependency-free SVG
  (fixed float formatting, no timestamps — byte-reproducible, so
  tests pin exact output);
- `save_png=True` uses matplotlib behind the same guarded-optional-
  dependency pattern as the Keras LSTM and PIL decode paths.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

# reference palette: plt.plot 'b-', 'r--', 'g--' (covid_simulator.py:
# 310-312) — extended for more series
_PALETTE = ("#1f4fbf", "#bf2f2f", "#2f9f3f", "#9f5fbf", "#bf8f2f", "#2f9f9f")
_DASH = ("", "6,4", "6,4", "3,3", "3,3", "3,3")  # solid, dashed… like b-/r--/g--


def _fmt(v: float) -> str:
    return f"{v:.2f}"


def _render_svg(
    rows: list,
    x_col: str,
    y_cols: Sequence[str],
    title: str,
    width: int,
    height: int,
) -> str:
    """One deterministic SVG line chart: polyline per series, min/max
    axis labels, legend, title. Pure string assembly — identical bytes
    for identical input."""
    pad = 60
    xs = [float(r[0]) for r in rows]
    ys = [v for r in rows for v in r[1:] if v is not None]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = (min(ys), max(ys)) if ys else (0.0, 1.0)
    x_span = (x_hi - x_lo) or 1.0
    y_span = (y_hi - y_lo) or 1.0

    def sx(v: float) -> float:
        return pad + (v - x_lo) / x_span * (width - 2 * pad)

    def sy(v: float) -> float:
        return height - pad - (v - y_lo) / y_span * (height - 2 * pad)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width // 2}" y="24" text-anchor="middle" '
        f'font-size="16">{escape(title)}</text>',
        # axes
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" '
        f'y2="{height - pad}" stroke="black"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" '
        'stroke="black"/>',
        f'<text x="{pad}" y="{height - pad + 16}" font-size="10">'
        f"{_fmt(x_lo)}</text>",
        f'<text x="{width - pad}" y="{height - pad + 16}" '
        f'text-anchor="end" font-size="10">{_fmt(x_hi)}</text>',
        f'<text x="{pad - 4}" y="{height - pad}" text-anchor="end" '
        f'font-size="10">{_fmt(y_lo)}</text>',
        f'<text x="{pad - 4}" y="{pad + 4}" text-anchor="end" '
        f'font-size="10">{_fmt(y_hi)}</text>',
    ]
    for i, yc in enumerate(y_cols):
        pts = " ".join(
            f"{_fmt(sx(float(r[0])))},{_fmt(sy(float(r[1 + i])))}"
            for r in rows
            if r[1 + i] is not None
        )
        color = _PALETTE[i % len(_PALETTE)]
        dash = _DASH[i % len(_DASH)]
        dash_attr = f' stroke-dasharray="{dash}"' if dash else ""
        parts.append(
            f'<polyline fill="none" stroke="{color}"{dash_attr} '
            f'stroke-width="1.5" points="{pts}"/>'
        )
        # legend (reference: plt.legend([...]))
        ly = pad + 14 * i
        parts.append(
            f'<line x1="{width - pad - 110}" y1="{ly}" '
            f'x2="{width - pad - 86}" y2="{ly}" stroke="{color}"'
            f"{dash_attr} stroke-width=\"1.5\"/>"
        )
        parts.append(
            f'<text x="{width - pad - 80}" y="{ly + 4}" font-size="11">'
            f"{escape(str(yc))}</text>"
        )
    parts.append("</svg>")
    return "\n".join(parts)


def plot_series_sink(
    df: DataFrame,
    out_dir: str,
    x_col: str,
    y_cols: Sequence[str],
    group_col: str | None = None,
    title: str | None = None,
    width: int = 900,
    height: int = 600,
    max_points: int = 100_000,
    save_png: bool = False,
) -> list[str]:
    """Render per-group line charts of an ALREADY-REDUCED series table —
    the engine's S6 sink (the reference's per-state forecast plots,
    covid_simulator.py:298-319: one file per group, one curve per
    series, legend + title). Returns the written file paths, one per
    group (SVG by default; `save_png=True` additionally writes PNGs via
    matplotlib when available).

    Scale guard: a plot is a driver-side artifact of a few hundred
    points; the collect refuses more than `max_points` rows — plotting
    raw corpus data is an aggregation bug, reduce first (the reference
    plots per-state 30-180 point horizons)."""
    y_cols = list(y_cols)
    cols = ([group_col] if group_col else []) + [x_col] + y_cols
    capped = df.select(*cols).limit(max_points + 1).collect()
    if len(capped) > max_points:
        raise ValueError(
            f"plot_series_sink got more than {max_points} rows — plots "
            "are driver-side artifacts; aggregate to a per-group series "
            "first (the reference plots <=180-point horizons per state)"
        )
    groups: dict = {}
    for r in capped:
        key = r[0] if group_col else "all"
        pt = tuple(r[1:]) if group_col else tuple(r)
        if pt[0] is None:
            continue  # a NULL x has no position on the axis
        groups.setdefault(key, []).append(pt)
    os.makedirs(out_dir, exist_ok=True)
    out_paths = []
    for key in sorted(groups, key=str):
        rows = sorted(groups[key], key=lambda t: t[0])
        gtitle = f"{title or 'series'} — {key}" if group_col else (
            title or "series"
        )
        svg = _render_svg(rows, x_col, y_cols, gtitle, width, height)
        # the group VALUE names the file: strip anything path-hostile
        # ('/', '..', spaces) so a malicious or merely odd key can
        # neither escape out_dir nor produce an unopenable name
        safe_key = re.sub(r"[^A-Za-z0-9._-]", "_", str(key)) or "group"
        path = os.path.join(out_dir, f"plot_{safe_key}.svg")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(svg)
        out_paths.append(path)
        if save_png:
            _save_png(rows, y_cols, gtitle, path.replace(".svg", ".png"))
            out_paths.append(path.replace(".svg", ".png"))
    return out_paths


def _save_png(rows, y_cols, title, path):  # pragma: no cover - no mpl here
    """The reference's actual PNG renderer, behind the guarded-optional
    import pattern (like the Keras LSTM / PIL decode paths)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise NotImplementedError(
            "PNG plot sink needs matplotlib; this environment ships "
            "none — the SVG output (default) carries the same chart"
        ) from e
    plt.figure(figsize=(15, 10))
    xs = [float(r[0]) for r in rows]
    styles = ("b-", "r--", "g--")
    for i, yc in enumerate(y_cols):
        plt.plot(xs, [r[1 + i] for r in rows], styles[i % len(styles)])
    plt.legend(list(y_cols))
    plt.title(title)
    plt.savefig(path)
    plt.clf()
    plt.close()
