"""Result-presentation sinks: HTML table render and SVG bar-chart render.

Reference parity:
- `render_table` mirrors the reference's bindings→HTML-table stream
  (docs/scripts/document.js:956-985 — headers from the first binding,
  one <td> per value, <tbody> accumulation). Two deliberate deviations,
  both hardenings: values are HTML-escaped (the reference interpolates
  raw `value.value` into innerHTML), and the row stream is BOUNDED
  (`max_rows` via toLocalIterator) so a driver never materializes an
  unbounded result — the reference streams bindings for the same reason.
- `render_bar_chart` mirrors `renderPlotlyGraph`
  (docs/scripts/queryManager.js:66-82): a bar chart of the 2-column
  (x, y) frame that `prepare_plot_data` validated, dynamic title
  "Top <x> by <y>" (queryManager.js:56), axis titles from the column
  labels. Plotly is a browser CDN dependency, so the engine-side
  equivalent emits self-contained deterministic SVG — same data→marks
  mapping, no rendering library.

Scale note: render is a driver-side presentation sink for human-sized
results; both entry points take explicit row bounds and fetch rows
through `toLocalIterator` (one partition in flight) rather than
`collect`, so an accidentally-huge input costs bounded driver memory.
"""

from __future__ import annotations

import html
import itertools

from pyspark.sql import DataFrame

from graphforge_spark.plans.plot import prepare_plot_data


def _bounded_rows(df: DataFrame, max_rows: int) -> list:
    """First max_rows rows without collect(): limit pushes the bound into
    the plan, toLocalIterator streams one partition at a time."""
    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    return list(itertools.islice(df.limit(max_rows).toLocalIterator(), max_rows))


def render_table(result: DataFrame, max_rows: int = 1000) -> str:
    """Render a bindings frame as the reference's HTML <table> string.

    Headers come from the frame's columns (the reference takes them from
    the first binding's keys — a DataFrame's schema is the same set,
    known without peeking at data, so empty results still render a
    header row). NULL (unbound OPTIONAL variables) renders as an empty
    cell — Comunica bindings simply omit unbound entries, and an empty
    <td> is the table-shaped equivalent.
    """
    cols = result.columns
    parts = ['<table border="1"><thead><tr>']
    parts += [f"<th>{html.escape(str(c))}</th>" for c in cols]
    parts.append("</tr></thead><tbody>")
    for row in _bounded_rows(result, max_rows):
        parts.append("<tr>")
        for c in cols:
            v = row[c]
            parts.append(f"<td>{'' if v is None else html.escape(str(v))}</td>")
        parts.append("</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


def render_bar_chart(
    result: DataFrame,
    max_bars: int = 100,
    width: int = 640,
    height: int = 360,
) -> str | None:
    """Render a 2-column query result as a deterministic SVG bar chart.

    Applies the reference's plot guard first (`prepare_plot_data` — the
    exactly-2-columns / numeric-y contract of queryManager.js:20-42) and
    returns None when the result is not plottable, exactly like the
    reference's silent plot skip. Otherwise emits a standalone SVG:
    one <rect> per (x, y) row in input order, bar heights linearly
    scaled to max(y), x labels under the bars, the dynamic
    "Top <x> by <y>" title, and axis labels — the same marks
    renderPlotlyGraph builds, minus the interactive layer.
    """
    x_label, y_label = (result.columns + ["", ""])[:2]
    prepared = prepare_plot_data(result)
    if prepared is None:
        return None
    rows = _bounded_rows(prepared, max_bars)
    if not rows:
        return None

    top_pad, bottom_pad, left_pad, right_pad = 40, 60, 50, 10
    plot_w = width - left_pad - right_pad
    plot_h = height - top_pad - bottom_pad
    # zero-baseline diverging scale: prepare_plot_data admits negative y
    # (parseFloat semantics), and SVG rejects negative rect heights — so
    # bars grow up from the baseline for y>0 and down for y<0.
    y_max = max(0.0, max(r.y for r in rows))
    y_min = min(0.0, min(r.y for r in rows))
    y_span = y_max - y_min
    y_scale = (plot_h / y_span) if y_span > 0 else 0.0
    baseline_y = top_pad + y_max * y_scale if y_span > 0 else top_pad + plot_h
    slot = plot_w / len(rows)
    bar_w = max(1.0, slot * 0.8)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<title>{html.escape(f"Top {x_label} by {y_label}")}</title>',
        f'<text x="{width / 2:.1f}" y="20" text-anchor="middle" '
        f'font-size="14">{html.escape(f"Top {x_label} by {y_label}")}</text>',
        # axes
        f'<line x1="{left_pad}" y1="{top_pad}" x2="{left_pad}" '
        f'y2="{top_pad + plot_h}" stroke="black"/>',
        f'<line x1="{left_pad}" y1="{top_pad + plot_h}" '
        f'x2="{left_pad + plot_w}" y2="{top_pad + plot_h}" stroke="black"/>',
        f'<text x="12" y="{top_pad + plot_h / 2:.1f}" font-size="11" '
        f'transform="rotate(-90 12 {top_pad + plot_h / 2:.1f})" '
        f'text-anchor="middle">{html.escape(str(y_label))}</text>',
        f'<text x="{left_pad + plot_w / 2:.1f}" y="{height - 6}" '
        f'font-size="11" text-anchor="middle">{html.escape(str(x_label))}</text>',
    ]
    for i, r in enumerate(rows):
        bar_h = abs(r.y) * y_scale
        bx = left_pad + i * slot + (slot - bar_w) / 2
        by = baseline_y - bar_h if r.y >= 0 else baseline_y
        parts.append(
            f'<rect x="{bx:.2f}" y="{by:.2f}" width="{bar_w:.2f}" '
            f'height="{bar_h:.2f}" fill="#4472c4">'
            f"<title>{html.escape(str(r.x))}: {r.y:g}</title></rect>"
        )
        parts.append(
            f'<text x="{bx + bar_w / 2:.2f}" y="{top_pad + plot_h + 14}" '
            f'font-size="10" text-anchor="middle">{html.escape(str(r.x))}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)
