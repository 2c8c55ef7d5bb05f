"""Self-contained HTML dashboards (single file, no build step).

The reference ships Jinja-templated single-file HTML apps — cluster studio
(/root/reference/splink/internals/cluster_studio.py), the comparison viewer
(splink_comparison_viewer.py) — whose data payloads this engine already
emits (charts.py:265-307). This module closes the gap: it inlines those
payloads as JSON into one HTML string with
- a dependency-free vanilla-JS core (cluster selector, membership/edge
  tables, deterministic circular node-link SVG) that renders OFFLINE, and
- optional Vega-Lite charts via the vega-embed CDN that enhance the page
  when the browser has network access.

Everything is data the engine computed; the HTML is presentation only.
"""

from __future__ import annotations

import html as _html
import json
from typing import Any

from pyspark.sql import DataFrame, functions as F

from .charts import cluster_studio_data, match_weights_chart_spec
from .model import Settings

_CDN = (
    '<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>\n'
    '<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>\n'
    '<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>'
)

_STYLE = """
body { font-family: system-ui, sans-serif; margin: 1.5rem; color: #222; }
h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin-top: 1.5rem; }
table { border-collapse: collapse; margin-top: .5rem; font-size: .85rem; }
th, td { border: 1px solid #ccc; padding: .25rem .5rem; text-align: left; }
th { background: #f3f3f3; }
svg { border: 1px solid #eee; margin-top: .5rem; }
select { font-size: 1rem; padding: .2rem; }
.muted { color: #777; font-size: .8rem; }
"""


def _page(title: str, payload: dict[str, Any], body: str, script: str) -> str:
    data_json = json.dumps(payload).replace("</", "<\\/")
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{_html.escape(title)}</title>
{_CDN}
<style>{_STYLE}</style>
</head><body>
<h1>{_html.escape(title)}</h1>
{body}
<script id="splink-data" type="application/json">{data_json}</script>
<script>
const DATA = JSON.parse(document.getElementById("splink-data").textContent);
function embed(el, spec) {{
  if (window.vegaEmbed) vegaEmbed(el, spec, {{actions: false}});
  else document.querySelector(el).textContent =
    "(chart requires network access to the vega-embed CDN)";
}}
{script}
</script>
</body></html>"""


def cluster_studio_dashboard(
    membership: DataFrame,
    edges: DataFrame,
    sample_clusters: int = 10,
    out_path: str | None = None,
    edge_l: str = "unique_id_l",
    edge_r: str = "unique_id_r",
) -> str:
    """Single-file cluster-studio HTML (reference cluster_studio.py's
    render_splink_cluster_studio_html surface): the N largest non-singleton
    clusters with a selector, membership table, edge table, and a
    deterministic circular node-link SVG. Returns the HTML; also writes it
    when `out_path` is given.

    The Spark work is bounded: only the sampled clusters' rows are
    collected (cluster_studio_data limits server-side)."""
    mem_df, edge_df = cluster_studio_data(
        membership, edges, sample_clusters, edge_l=edge_l, edge_r=edge_r)
    mem_rows = [r.asDict(recursive=True) for r in mem_df.collect()]
    edge_rows = [r.asDict(recursive=True) for r in edge_df.collect()]
    payload = {
        "membership": [{k: (str(v) if v is not None else None)
                        for k, v in r.items()} for r in mem_rows],
        "edges": [{k: (float(v) if isinstance(v, (int, float))
                       and k not in (edge_l, edge_r, "cluster_id")
                       else str(v))
                   for k, v in r.items()} for r in edge_rows],
        "edge_l": edge_l, "edge_r": edge_r,
    }
    body = """
<p class="muted">Largest non-singleton clusters; pick one to inspect.</p>
<label>Cluster: <select id="cluster-select"></select></label>
<h2>Graph</h2>
<svg id="graph" width="420" height="420"></svg>
<h2>Cluster sizes</h2><div id="size-chart"></div>
<h2>Members</h2><div id="members"></div>
<h2>Edges</h2><div id="edge-table"></div>
"""
    script = """
const byCluster = {};
for (const m of DATA.membership) {
  (byCluster[m.cluster_id] ||= {members: [], edges: []}).members.push(m);
}
for (const e of DATA.edges) {
  if (byCluster[e.cluster_id]) byCluster[e.cluster_id].edges.push(e);
}
const ids = Object.keys(byCluster).sort(
  (a, b) => byCluster[b].members.length - byCluster[a].members.length);
const sel = document.getElementById("cluster-select");
for (const id of ids) {
  const o = document.createElement("option");
  o.value = id;
  o.textContent = `${id} (${byCluster[id].members.length} nodes)`;
  sel.appendChild(o);
}
function table(el, rows) {
  // record values are untrusted: cells via createElement/textContent so
  // markup in a field renders as text instead of injecting into the page
  const host = document.querySelector(el);
  host.replaceChildren();
  if (!rows.length) { host.textContent = "(none)"; return; }
  const cols = Object.keys(rows[0]);
  const t = document.createElement("table");
  const hr = document.createElement("tr");
  for (const c of cols) {
    const th = document.createElement("th"); th.textContent = c;
    hr.appendChild(th);
  }
  t.appendChild(hr);
  for (const r of rows) {
    const tr = document.createElement("tr");
    for (const c of cols) {
      const td = document.createElement("td"); td.textContent = r[c] ?? "";
      tr.appendChild(td);
    }
    t.appendChild(tr);
  }
  host.appendChild(t);
}
function draw(id) {
  const {members, edges} = byCluster[id];
  const svg = document.getElementById("graph");
  svg.replaceChildren();
  const cx = 210, cy = 210, R = 170, pos = {};
  members.forEach((m, i) => {
    const a = 2 * Math.PI * i / members.length - Math.PI / 2;
    pos[m.node_id] = [cx + R * Math.cos(a), cy + R * Math.sin(a)];
  });
  for (const e of edges) {
    const p = pos[e[DATA.edge_l]], q = pos[e[DATA.edge_r]];
    if (!p || !q) continue;
    const l = document.createElementNS("http://www.w3.org/2000/svg", "line");
    l.setAttribute("x1", p[0]); l.setAttribute("y1", p[1]);
    l.setAttribute("x2", q[0]); l.setAttribute("y2", q[1]);
    l.setAttribute("stroke", "#88a"); l.setAttribute("stroke-width", "1.5");
    svg.appendChild(l);
  }
  members.forEach(m => {
    const [x, y] = pos[m.node_id];
    const c = document.createElementNS("http://www.w3.org/2000/svg", "circle");
    c.setAttribute("cx", x); c.setAttribute("cy", y); c.setAttribute("r", 6);
    c.setAttribute("fill", "#4472c4");
    const t = document.createElementNS("http://www.w3.org/2000/svg", "title");
    t.textContent = m.node_id; c.appendChild(t);
    svg.appendChild(c);
  });
  table("#members", members);
  table("#edge-table", edges);
}
sel.addEventListener("change", () => draw(sel.value));
if (ids.length) draw(ids[0]);
embed("#size-chart", {
  "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
  data: {values: ids.map(id => ({cluster: id,
                                 size: byCluster[id].members.length}))},
  mark: "bar",
  encoding: {x: {field: "cluster", type: "nominal", sort: "-y"},
             y: {field: "size", type: "quantitative"}}});
"""
    page = _page("Cluster studio", payload, body, script)
    if out_path:
        with open(out_path, "w") as f:
            f.write(page)
    return page


def comparison_viewer_dashboard(
    pred: DataFrame,
    settings: Settings,
    example_rows_per_pattern: int = 2,
    max_patterns: int = 200,
    out_path: str | None = None,
) -> str:
    """Single-file comparison-viewer HTML (splink_comparison_viewer.py
    surface): distinct gamma patterns with counts, example pairs, and a
    pattern-count bar chart. Collects at most `max_patterns` patterns'
    example rows."""
    from .charts import comparison_viewer_data

    settings = settings.with_defaults()
    gcols = [c.gamma_column for c in settings.comparisons]
    df = comparison_viewer_data(pred, settings, example_rows_per_pattern)
    keep = (gcols + ["pattern_count", "example_rank", "match_weight",
                     "match_probability", "unique_id_l", "unique_id_r"])
    rows = [r.asDict() for r in
            df.select(*[c for c in keep if c in df.columns])
            .orderBy(F.desc_nulls_last("pattern_count"), *gcols,
                     "example_rank")
            .limit(max_patterns * example_rows_per_pattern).collect()]
    payload = {"rows": [{k: (None if v is None else
                             (float(v) if isinstance(v, float) else str(v)))
                         for k, v in r.items()} for r in rows],
               "gamma_columns": gcols}
    body = """
<p class="muted">Distinct comparison-vector patterns, most frequent first;
example pairs under each pattern.</p>
<h2>Pattern frequencies</h2><div id="pattern-chart"></div>
<h2>Patterns</h2><div id="pattern-table"></div>
"""
    script = """
const rows = DATA.rows, g = DATA.gamma_columns;
const patterns = {};
for (const r of rows) {
  const key = g.map(c => r[c]).join("|");
  (patterns[key] ||= {count: +r.pattern_count, examples: []})
    .examples.push(r);
}
const keys = Object.keys(patterns).sort(
  (a, b) => patterns[b].count - patterns[a].count);
// untrusted record values: build cells via createElement/textContent
const tbl = document.createElement("table");
const hr = document.createElement("tr");
for (const c of [...g, "count", "example pair", "match_weight"]) {
  const th = document.createElement("th"); th.textContent = c;
  hr.appendChild(th);
}
tbl.appendChild(hr);
for (const k of keys) {
  const p = patterns[k];
  for (const e of p.examples) {
    const tr = document.createElement("tr");
    const cells = [...g.map(c => e[c]), p.count,
                   `${e.unique_id_l} / ${e.unique_id_r}`,
                   e.match_weight == null ? "" :
                     (+e.match_weight).toFixed(4)];
    for (const v of cells) {
      const td = document.createElement("td"); td.textContent = v ?? "";
      tr.appendChild(td);
    }
    tbl.appendChild(tr);
  }
}
document.getElementById("pattern-table").replaceChildren(tbl);
embed("#pattern-chart", {
  "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
  data: {values: keys.map(k => ({pattern: k, count: patterns[k].count}))},
  mark: "bar",
  encoding: {x: {field: "pattern", type: "nominal", sort: "-y"},
             y: {field: "count", type: "quantitative",
                 scale: {type: "log"}}}});
"""
    page = _page("Comparison viewer", payload, body, script)
    if out_path:
        with open(out_path, "w") as f:
            f.write(page)
    return page


def generate_labelling_tool_comparisons(
    linker,
    record: dict,
    match_weight_threshold: float = -4.0,
) -> DataFrame:
    """Candidate pairs for hand-labelling one record (reference
    labelling_tool.py:24-59 generate_labelling_tool_comparisons): the
    record is scored against the node table with the linker's own blocking
    rules and model, keeping candidates above a match-WEIGHT threshold
    (the reference's default -4 ~ probability 0.059)."""
    uid = linker.settings.unique_id_column_name
    rec = dict(record)
    rec.setdefault(uid, "__labelling_target__")
    new_df = linker.spark.createDataFrame(
        [{**{f.name: None for f in linker._input.schema.fields}, **rec}],
        linker._input.schema)
    matches = linker.find_matches_to_new_records(new_df)
    return matches.where(
        F.col("match_weight") >= F.lit(float(match_weight_threshold)))


def labelling_tool_dashboard(
    matches: DataFrame,
    settings: Settings,
    max_candidates: int = 200,
    show_predictions: bool = True,
    out_path: str | None = None,
) -> str:
    """Single-file labelling-tool HTML (reference labelling_tool.py:62-114
    render_labelling_tool_html): each candidate pair rendered as a
    side-by-side record card with Match / Not match / Unsure buttons; the
    collected labels are downloadable as JSON
    (unique_id_l, unique_id_r, clerical_match_score in {1, 0, 0.5} — the
    shape `truth_space_table` consumes). Optionally hides the model's own
    predictions so labelling stays blind. Offline, dependency-free."""
    settings = settings.with_defaults()
    cols = []
    for comp in settings.comparisons:
        for lv in comp.levels:
            for c in (lv.column or comp.column, lv.column2,
                      lv.lat_column, lv.long_column):
                if c and c not in cols:
                    cols.append(c)
    pair_cols = [c for c in cols
                 if f"{c}_l" in matches.columns and f"{c}_r" in matches.columns]
    keep = ["unique_id_l", "unique_id_r"]
    keep += [f"{c}_{side}" for c in pair_cols for side in ("l", "r")]
    for extra in ("match_weight", "match_probability", "match_key"):
        if extra in matches.columns:
            keep.append(extra)
    rows = [r.asDict() for r in
            matches.select(*keep)
            .orderBy(F.desc_nulls_last("match_weight")
                     if "match_weight" in keep else F.col("unique_id_r"))
            .limit(max_candidates).collect()]
    payload = {
        "rows": [{k: (None if v is None else
                      (float(v) if isinstance(v, float) else str(v)))
                  for k, v in r.items()} for r in rows],
        "columns": pair_cols,
        "show_predictions": bool(show_predictions),
    }
    body = """
<p class="muted">Label each candidate pair. Labels collect below and
download as JSON (clerical_match_score: 1 match, 0 non-match, 0.5 unsure)
ready for truth_space_table / estimate_m_from_pairwise_labels.</p>
<div id="cards"></div>
<h2>Labels</h2>
<button id="download">Download labels JSON</button>
<pre id="labels-out" style="background:#f7f7f7;padding:.5rem"></pre>
"""
    script = """
// record values are UNTRUSTED data: every cell is built via
// createElement/textContent, so markup in a field (e.g. an img tag with
// an onerror handler) renders as text instead of injecting into the page.
// Label keys are JSON arrays, not a "|" join, so ids containing "|"
// round-trip intact.
const labels = {};
const key = r => JSON.stringify([r.unique_id_l, r.unique_id_r]);
function renderLabels() {
  const out = Object.entries(labels).map(([k, v]) => {
    const [l, r] = JSON.parse(k);
    return {unique_id_l: l, unique_id_r: r, clerical_match_score: v};
  });
  document.getElementById("labels-out").textContent =
    JSON.stringify(out, null, 1);
  return out;
}
document.getElementById("download").addEventListener("click", () => {
  const blob = new Blob([JSON.stringify(renderLabels(), null, 1)],
                        {type: "application/json"});
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "labels.json";
  a.click();
});
const el = (tag, text, parent) => {
  const e = document.createElement(tag);
  if (text != null) e.textContent = text;
  if (parent) parent.appendChild(e);
  return e;
};
const cards = document.getElementById("cards");
DATA.rows.forEach((r, i) => {
  const d = document.createElement("div");
  d.style.cssText =
    "border:1px solid #ccc;margin:.6rem 0;padding:.6rem;border-radius:4px";
  const head = el("div", null, d);
  el("b", r.unique_id_l, head);
  head.appendChild(document.createTextNode(" vs "));
  el("b", r.unique_id_r, head);
  if (DATA.show_predictions && r.match_weight != null) {
    const s = el("span", ` weight ${(+r.match_weight).toFixed(3)},` +
                         ` p=${(+r.match_probability).toFixed(4)}`, head);
    s.className = "muted";
  }
  const tbl = el("table", null, d);
  const hr = el("tr", null, tbl);
  for (const t of ["column", "left", "right"]) el("th", t, hr);
  for (const c of DATA.columns) {
    const tr = el("tr", null, tbl);
    el("td", c, tr);
    el("td", r[c + "_l"] ?? "", tr);
    el("td", r[c + "_r"] ?? "", tr);
  }
  for (const [txt, v] of [["Match", 1], ["Not match", 0], ["Unsure", 0.5]]) {
    const b = el("button", txt, d);
    b.addEventListener("click", () => {
      labels[key(r)] = v;
      d.style.background = {1: "#e8f5e9", 0: "#ffebee", 0.5: "#fffde7"}[v];
      renderLabels();
    });
    d.appendChild(document.createTextNode(" "));
  }
  cards.appendChild(d);
});
renderLabels();
"""
    page = _page("Labelling tool", payload, body, script)
    if out_path:
        with open(out_path, "w") as f:
            f.write(page)
    return page


def match_weights_dashboard(settings: Settings,
                            out_path: str | None = None) -> str:
    """Single-file page embedding the match-weights Vega-Lite spec
    (charts.match_weights_chart_spec)."""
    spec = match_weights_chart_spec(settings)
    page = _page("Model match weights", {"spec": spec},
                 '<div id="mw-chart"></div>',
                 'embed("#mw-chart", DATA.spec);')
    if out_path:
        with open(out_path, "w") as f:
            f.write(page)
    return page
