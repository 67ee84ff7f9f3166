"""Static HTML evaluation report over the long-format metrics store —
the engine's stand-in for the reference's report-UI pushes: the Grafana
dashboard (code/grafana/dashboards/churn-model-evaluation.json, 25
panels) and the Evidently workspace upload
(churn_prediction_pipeline.py:341-355).

Mirrors the dashboard's panel inventory 1:1:

- "Latest Prediction Scores": 4 stat tiles (f1score / precision /
  recall / accuracy) with the dashboard's thresholds (red < 0.5 ≤
  yellow < 0.7 ≤ green) rendered as STATUS — color plus label, never
  color alone — and 4 score-over-time line panels.
- "Drift Summary Metrics": driftedcolumnscount[count] and [share]
  over time.
- "Metric Drift p-Values": one panel per monitored column
  (``valuedrift_<col>``) with the 0.05 significance threshold drawn as
  a labeled dashed rule (churn_prediction_pipeline.py:419).

Rendering is dependency-free inline SVG: single-series 2px lines (no
legend — the panel title names the series), recessive grid, last-value
direct label, native ``<title>`` hover tooltips per point, a collapsible
table view of the raw store, and light/dark via CSS custom properties.

Scale: the metrics store is dashboard-sized BY CONSTRUCTION (runs ×
metric names — the reference's drift_metrics table), so one ordered
collect is the right plan; for a huge store, pre-filter with
``metrics_unpivot``/``latest_per_metric`` and pass the slice in.
"""

from __future__ import annotations

import html
from datetime import datetime

from pyspark.sql import DataFrame

SCORE_METRICS = ["f1score", "precision", "recall", "accuracy"]
SCORE_TITLES = {
    "f1score": "F1 Score",
    "precision": "Precision",
    "recall": "Recall",
    "accuracy": "Accuracy",
}
DRIFT_SUMMARY = [
    ("driftedcolumnscount[count]", "Number of Drifted Columns"),
    ("driftedcolumnscount[share]", "Drifted Column Share of Total Columns"),
]
P_VALUE_THRESHOLD = 0.05  # churn_prediction_pipeline.py:419

# Status steps follow the dashboard's stat-panel thresholds
# (churn-model-evaluation.json): red < 0.5 ≤ yellow < 0.7 ≤ green.
_STATUS = [
    (0.7, "good", "var(--status-good)"),
    (0.5, "warning", "var(--status-warning)"),
    (float("-inf"), "critical", "var(--status-critical)"),
]

_CSS = """
.viz-root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f1f0ee;
  --text-primary: #0b0b0b; --text-secondary: #52514e;
  --grid: #e3e2de; --series-1: #2a78d6;
  --status-good: #0ca30c; --status-warning: #fab219;
  --status-critical: #d03b3b;
  font-family: system-ui, sans-serif; background: var(--surface-1);
  color: var(--text-primary); padding: 24px; margin: 0;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242422;
    --text-primary: #ffffff; --text-secondary: #c3c2b7;
    --grid: #3a3936; --series-1: #3987e5;
  }
}
:root[data-theme="dark"] .viz-root {
  color-scheme: dark;
  --surface-1: #1a1a19; --surface-2: #242422;
  --text-primary: #ffffff; --text-secondary: #c3c2b7;
  --grid: #3a3936; --series-1: #3987e5;
}
.viz-root h1 { font-size: 22px; margin: 0 0 16px; }
.viz-root h2 { font-size: 16px; margin: 24px 0 8px;
               color: var(--text-secondary); }
.stat-row { display: flex; gap: 12px; flex-wrap: wrap; }
.stat { background: var(--surface-2); border-radius: 8px;
        padding: 12px 20px; min-width: 130px; }
.stat .name { font-size: 12px; color: var(--text-secondary); }
.stat .value { font-size: 28px; font-weight: 600; }
.stat .status { font-size: 12px; font-weight: 600; }
.panel-grid { display: flex; gap: 12px; flex-wrap: wrap; }
.panel { background: var(--surface-2); border-radius: 8px; padding: 10px; }
.panel .title { font-size: 13px; margin-bottom: 4px; }
.viz-root table { border-collapse: collapse; font-size: 12px; }
.viz-root td, .viz-root th { padding: 3px 10px; text-align: left;
  border-bottom: 1px solid var(--grid); }
"""


def _status_of(value: float) -> tuple[str, str]:
    for cut, label, color in _STATUS:
        if value >= cut:
            return label, color
    return "critical", "var(--status-critical)"  # pragma: no cover


def _fmt_ts(ts) -> str:
    if isinstance(ts, datetime):
        return ts.strftime("%Y-%m-%d %H:%M")
    return str(ts)


def _line_svg(
    points: list[tuple], threshold: float | None = None,
    w: int = 280, h: int = 90,
) -> str:
    """Single-series line panel: 2px series line, recessive grid, direct
    label on the last value, per-point native hover tooltips, optional
    labeled dashed threshold rule."""
    pad_l, pad_r, pad_t, pad_b = 8, 46, 8, 8
    vals = [float(v) for _, v in points]
    vmin, vmax = min(vals), max(vals)
    if threshold is not None:
        vmin, vmax = min(vmin, threshold), max(vmax, threshold)
    if vmax == vmin:
        vmax = vmin + 1.0
    iw, ih = w - pad_l - pad_r, h - pad_t - pad_b

    def x(i: int) -> float:
        return pad_l + (iw * i / max(len(points) - 1, 1))

    def y(v: float) -> float:
        return pad_t + ih * (1 - (v - vmin) / (vmax - vmin))

    parts = [
        f'<svg viewBox="0 0 {w} {h}" width="{w}" height="{h}" role="img">'
    ]
    for g in (0.0, 0.5, 1.0):  # recessive grid: 3 hairlines
        gy = pad_t + ih * g
        parts.append(
            f'<line x1="{pad_l}" y1="{gy:.1f}" x2="{pad_l + iw}" '
            f'y2="{gy:.1f}" stroke="var(--grid)" stroke-width="1"/>'
        )
    if threshold is not None:
        ty = y(threshold)
        parts.append(
            f'<line x1="{pad_l}" y1="{ty:.1f}" x2="{pad_l + iw}" '
            f'y2="{ty:.1f}" stroke="var(--text-secondary)" '
            'stroke-width="1" stroke-dasharray="4 3"/>'
            f'<text x="{pad_l + iw + 4}" y="{ty + 3:.1f}" font-size="9" '
            f'fill="var(--text-secondary)">p={threshold}</text>'
        )
    pts = " ".join(f"{x(i):.1f},{y(v):.1f}" for i, (_, v) in enumerate(points))
    parts.append(
        f'<polyline points="{pts}" fill="none" stroke="var(--series-1)" '
        'stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/>'
    )
    for i, (ts, v) in enumerate(points):  # hover targets > mark size
        parts.append(
            f'<circle cx="{x(i):.1f}" cy="{y(v):.1f}" r="8" fill="transparent">'
            f"<title>{html.escape(_fmt_ts(ts))}: {v:.4f}</title></circle>"
        )
    lx, ly = x(len(points) - 1), y(vals[-1])
    parts.append(
        f'<text x="{lx + 5:.1f}" y="{ly + 3:.1f}" font-size="10" '
        f'fill="var(--text-primary)">{vals[-1]:.3f}</text>'
    )
    parts.append("</svg>")
    return "".join(parts)


def render_dashboard_html(
    metrics: DataFrame,
    title: str = "Customer Churn Model Evaluation",
    path: str | None = None,
) -> str:
    """Render the metrics store (metric_name, value, created_at) to one
    self-contained HTML page mirroring the reference dashboard's panels.
    Optionally writes to ``path``. Returns the HTML string."""
    rows = metrics.select("metric_name", "value", "created_at").collect()
    series: dict[str, list[tuple]] = {}
    for r in sorted(rows, key=lambda r: (r["metric_name"], r["created_at"])):
        if r["value"] is None:  # degenerate batch (0/0 score, all-null
            continue  # column) — skip the point, never fail the report
        series.setdefault(r["metric_name"], []).append(
            (r["created_at"], float(r["value"]))
        )

    out = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        f"<style>{_CSS}</style></head><body class='viz-root'>",
        f"<h1>{html.escape(title)}</h1>",
        "<h2>Latest Prediction Scores</h2><div class='stat-row'>",
    ]
    for m in SCORE_METRICS:
        if m not in series:
            continue
        latest = series[m][-1][1]
        label, color = _status_of(latest)
        out.append(
            f"<div class='stat'><div class='name'>{SCORE_TITLES[m]}</div>"
            f"<div class='value'>{latest:.3f}</div>"
            f"<div class='status' style='color:{color}'>"
            f"{'✓' if label == 'good' else '⚠'} {label}</div></div>"
        )
    out.append("</div><div class='panel-grid'>")
    for m in SCORE_METRICS:
        if m not in series:
            continue
        out.append(
            f"<div class='panel'><div class='title'>"
            f"{SCORE_TITLES[m]} over time</div>{_line_svg(series[m])}</div>"
        )
    out.append("</div><h2>Drift Summary Metrics</h2><div class='panel-grid'>")
    for m, panel_title in DRIFT_SUMMARY:
        if m not in series:
            continue
        out.append(
            f"<div class='panel'><div class='title'>"
            f"{html.escape(panel_title)}</div>{_line_svg(series[m])}</div>"
        )
    out.append("</div><h2>Metric Drift p-Values</h2><div class='panel-grid'>")
    for m in sorted(series):
        if not m.startswith("valuedrift_"):
            continue
        col = m[len("valuedrift_"):]
        out.append(
            f"<div class='panel'><div class='title'>"
            f"{html.escape(col)} (KS p-value)</div>"
            f"{_line_svg(series[m], threshold=P_VALUE_THRESHOLD)}</div>"
        )
    out.append(
        "</div><details><summary>Table view (all metrics)</summary>"
        "<table><tr><th>metric_name</th><th>value</th><th>created_at</th></tr>"
    )
    for name in sorted(series):
        for ts, v in series[name]:
            out.append(
                f"<tr><td>{html.escape(name)}</td><td>{v:.6f}</td>"
                f"<td>{html.escape(_fmt_ts(ts))}</td></tr>"
            )
    out.append("</table></details></body></html>")
    doc = "".join(out)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc)
    return doc
