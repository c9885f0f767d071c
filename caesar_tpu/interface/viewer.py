"""Trajectory viewer: browse run journals in a browser.

Stdlib-HTTP equivalent of the reference's FastHTML viewer
(interface/viewer.py:56-790): one route
``GET /?run_group=&run_name=&problem_id=&sample_id=`` rendering

* run-group census (finished/attempted DONE counts, viewer.py:93),
* prev/next problem and sample navigation (viewer.py:170-187 utils),
* a config summary from the trajectory's config.json,
* the per-turn compiled/correct/runtime trajectory table + an inline SVG
  runtime plot with optional torch-baseline overlay (viewer.py:350-598 —
  plotly replaced by dependency-free SVG),
* per-turn collapsibles: prompt, model response, kernel code, eval result,
  profiler output, token usage (viewer.py:601-756),
* partial-log rendering for unfinished runs (viewer.py:219-245),
* token accounting for both Anthropic-style (input_tokens/output_tokens)
  and OpenAI-style (prompt_tokens/completion_tokens) usage dicts
  (viewer.py:62-82).

The reference's undefined-``Warning`` crash on the no-final-result path
(viewer.py:457, SURVEY.md §7.4) is deliberately not reproduced.

Run:  python -m caesar_tpu.interface.viewer --log-dir runs/logs --port 5008
"""

from __future__ import annotations

import argparse
import html
import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

from caesar_tpu.analysis.fastp import fetch_baseline_ms
from caesar_tpu.harness import runs

_STYLE = """
body { font-family: system-ui, sans-serif; margin: 2rem; max-width: 1100px; }
table { border-collapse: collapse; margin: 0.8rem 0; }
td, th { border: 1px solid #ccc; padding: 0.3rem 0.7rem; text-align: left; }
th { background: #f3f3f3; }
details { margin: 0.5rem 0; border: 1px solid #ddd; border-radius: 4px; }
summary { padding: 0.4rem 0.8rem; background: #fafafa; cursor: pointer;
          font-weight: 600; }
pre { background: #f7f7f7; padding: 0.8rem; overflow-x: auto;
      white-space: pre-wrap; max-height: 420px; overflow-y: auto; }
.ok { color: #0a7d33; font-weight: 600; }
.bad { color: #c0392b; font-weight: 600; }
.nav a { margin-right: 1rem; }
.muted { color: #777; }
svg { border: 1px solid #eee; }
"""


def _input_tokens(usage: dict) -> Optional[int]:
    for key in ("input_tokens", "prompt_tokens"):
        if key in usage:
            return usage[key]
    return None


def _output_tokens(usage: dict) -> Optional[int]:
    for key in ("output_tokens", "completion_tokens"):
        if key in usage:
            return usage[key]
    return None


def _esc(text: object) -> str:
    return html.escape(str(text))


def _runtime_svg(runtimes, baseline_ms=None, width=640, height=220) -> str:
    """Inline SVG line plot of per-turn runtimes with optional baseline."""
    pts = [(i + 1, r) for i, r in enumerate(runtimes) if r and r > 0]
    if not pts:
        return '<p class="muted">no successful runtimes to plot</p>'
    values = [r for _, r in pts]
    if baseline_ms:
        values.append(baseline_ms)
    vmax = max(values) * 1.15
    n = len(runtimes)
    pad = 40

    def x(turn):
        return pad + (turn - 1) * (width - 2 * pad) / max(n - 1, 1)

    def y(val):
        return height - pad - val / vmax * (height - 2 * pad)

    poly = " ".join(f"{x(t):.1f},{y(r):.1f}" for t, r in pts)
    parts = [
        f'<svg width="{width}" height="{height}">',
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" '
        f'y2="{height - pad}" stroke="#999"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" '
        f'stroke="#999"/>',
        f'<polyline points="{poly}" fill="none" stroke="#2563eb" '
        f'stroke-width="2"/>',
    ]
    for t, r in pts:
        parts.append(
            f'<circle cx="{x(t):.1f}" cy="{y(r):.1f}" r="4" fill="#2563eb">'
            f"<title>turn {t}: {r:.3f} ms</title></circle>"
        )
    if baseline_ms:
        by = y(baseline_ms)
        parts.append(
            f'<line x1="{pad}" y1="{by:.1f}" x2="{width - pad}" y2="{by:.1f}"'
            f' stroke="#c0392b" stroke-dasharray="6 3"/>'
            f'<text x="{width - pad}" y="{by - 5:.1f}" text-anchor="end" '
            f'fill="#c0392b" font-size="12">baseline {baseline_ms:.3f} ms</text>'
        )
    parts.append(
        f'<text x="{pad}" y="{height - 8}" font-size="12" fill="#555">turn '
        f"(1..{n}) vs runtime ms, max {vmax:.3f}</text></svg>"
    )
    return "".join(parts)


class ViewerApp:
    def __init__(self, log_dir: str, baseline_file: Optional[str] = None,
                 baseline_level: int = 1):
        self.log_dir = Path(log_dir)
        self.baseline_file = baseline_file
        self.baseline_level = baseline_level

    # ------------------------------------------------------------------
    def render(self, query: dict) -> str:
        run_group = query.get("run_group")
        run_name = query.get("run_name")
        body = ['<h1>caesar-tpu trajectory viewer</h1>']

        groups = runs.get_run_groups(self.log_dir)
        if not groups:
            body.append(f"<p>No run groups under {_esc(self.log_dir)}.</p>")
            return self._page(body)

        body.append("<h2>Run groups</h2><ul>")
        for g in groups:
            body.append(f'<li><a href="/?run_group={_esc(g)}">{_esc(g)}</a></li>')
        body.append("</ul>")
        if not run_group:
            return self._page(body)

        # --- run-group census (reference viewer.py:93) ---
        stats = runs.get_finished_counts(self.log_dir, run_group)
        body.append(f"<h2>Group {_esc(run_group)}</h2><table>")
        body.append("<tr><th>run</th><th>finished</th><th>attempted</th></tr>")
        for name, st in sorted(stats.items()):
            body.append(
                f'<tr><td><a href="/?run_group={_esc(run_group)}&run_name='
                f'{_esc(name)}">{_esc(name)}</a></td>'
                f'<td>{st["finished"]}</td><td>{st["attempted"]}</td></tr>'
            )
        body.append("</table>")
        if not run_name:
            return self._page(body)

        problem_ids = runs.get_problem_ids(self.log_dir, run_group, run_name)
        if not problem_ids:
            body.append("<p>No problems in this run yet.</p>")
            return self._page(body)
        problem_id = int(query.get("problem_id", problem_ids[0]))
        sample_ids = runs.get_sample_ids(
            self.log_dir, run_group, run_name, problem_id
        ) or [1]
        sample_id = int(query.get("sample_id", sample_ids[0]))

        # --- navigation (reference viewer.py prev/next) ---
        def link(pid, sid, label):
            return (
                f'<a href="/?run_group={_esc(run_group)}&run_name='
                f"{_esc(run_name)}&problem_id={pid}&sample_id={sid}\">"
                f"{label}</a>"
            )

        prev_p = runs.prev_problem_id(problem_ids, problem_id)
        next_p = runs.next_problem_id(problem_ids, problem_id)
        body.append('<div class="nav">')
        body.append(link(prev_p, 1, "&larr; prev problem"))
        body.append(link(next_p, 1, "next problem &rarr;"))
        for sid in sample_ids:
            marker = "<b>" if sid == sample_id else ""
            end = "</b>" if sid == sample_id else ""
            body.append(link(problem_id, sid, f"{marker}sample {sid}{end}"))
        body.append("</div>")
        body.append(
            f"<h2>problem {problem_id} / sample {sample_id}</h2>"
        )

        sample_path = runs.sample_dir(
            self.log_dir, run_group, run_name, problem_id, sample_id
        )
        log = runs.load_log(sample_path)
        config = runs.load_config(sample_path)
        done = (sample_path / "DONE").exists()

        if log is None:
            body.append("<p>No log recorded yet for this trajectory.</p>")
            return self._page(body)
        if not done:
            body.append(
                '<p class="bad">Trajectory UNFINISHED — partial log shown '
                "(resumable).</p>"
            )

        # --- config summary (reference viewer.py:248-252) ---
        if config:
            keys = (
                "model_name", "backend", "dataset_name", "max_k",
                "num_samples", "temperature", "greedy_sample", "max_tokens",
                "prompt_strategy", "context_mode", "eval_backend",
            )
            body.append("<details><summary>Run config</summary><pre>")
            body.append(_esc(json.dumps(
                {k: config.get(k) for k in keys if k in config}, indent=2
            )))
            body.append("</pre></details>")

        max_turns = max((int(k) for k in log.keys() if str(k).isdigit()),
                        default=0)
        compiled, correct, runtime = runs.turn_trajectories(log, max_turns)

        # --- trajectory table ---
        body.append("<table><tr><th>turn</th><th>compiled</th>"
                    "<th>correct</th><th>runtime (ms)</th>"
                    "<th>in tok</th><th>out tok</th></tr>")
        total_in = total_out = 0
        for turn in range(1, max_turns + 1):
            usage = (log.get(str(turn)) or {}).get("token_usage") or {}
            tin, tout = _input_tokens(usage), _output_tokens(usage)
            total_in += tin or 0
            total_out += tout or 0

            def badge(v):
                if v is None:
                    return '<span class="muted">—</span>'
                return (
                    '<span class="ok">yes</span>'
                    if v
                    else '<span class="bad">no</span>'
                )

            rt = runtime[turn - 1]
            rt_text = f"{rt:.3f}" if rt and rt > 0 else "—"
            body.append(
                f"<tr><td>{turn}</td><td>{badge(compiled[turn - 1])}</td>"
                f"<td>{badge(correct[turn - 1])}</td><td>{rt_text}</td>"
                f"<td>{tin if tin is not None else '—'}</td>"
                f"<td>{tout if tout is not None else '—'}</td></tr>"
            )
        body.append(
            f"<tr><th colspan=4>total tokens</th><th>{total_in}</th>"
            f"<th>{total_out}</th></tr></table>"
        )

        baseline_ms = None
        if self.baseline_file:
            try:
                baseline_ms = fetch_baseline_ms(
                    self.baseline_file, self.baseline_level, problem_id
                )
            except Exception:
                baseline_ms = None
        body.append(_runtime_svg(runtime, baseline_ms))

        # --- per-turn collapsibles (reference viewer.py:601-756) ---
        for turn in range(1, max_turns + 1):
            data = log.get(str(turn)) or {}
            body.append(f"<h3>Turn {turn}</h3>")
            for field, label in (
                ("prompt", "Prompt"),
                ("model_response", "Model response"),
                ("kernel_code", "Kernel code"),
                ("eval_result", "Eval result"),
                ("profiler_result", "Profiler output"),
                ("token_usage", "Token usage"),
            ):
                value = data.get(field)
                if not value:
                    continue
                if isinstance(value, dict):
                    value = json.dumps(value, indent=2, default=str)
                body.append(
                    f"<details><summary>{label}</summary><pre>"
                    f"{_esc(value)}</pre></details>"
                )
        return self._page(body)

    def _page(self, body) -> str:
        return (
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>caesar-tpu viewer</title><style>{_STYLE}</style></head>"
            f"<body>{''.join(body)}</body></html>"
        )


def make_handler(app: ViewerApp):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path != "/":
                self.send_response(404)
                self.end_headers()
                return
            query = {
                k: v[0]
                for k, v in urllib.parse.parse_qs(parsed.query).items()
            }
            try:
                page = app.render(query)
                status = 200
            except Exception as e:  # render errors must not kill the server
                page = f"<pre>viewer error: {html.escape(repr(e))}</pre>"
                status = 500
            data = page.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    return Handler


def serve(log_dir: str, port: int = 5008, baseline_file: Optional[str] = None,
          baseline_level: int = 1) -> None:
    app = ViewerApp(log_dir, baseline_file, baseline_level)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(app))
    print(f"viewer listening on http://localhost:{port}/  (logs: {log_dir})")
    server.serve_forever()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", default="runs/logs")
    parser.add_argument("--port", type=int, default=5008)
    parser.add_argument("--baseline", default=None,
                        help="baseline timing JSON for the runtime plot")
    parser.add_argument("--level", type=int, default=1)
    args = parser.parse_args(argv)
    serve(args.log_dir, args.port, args.baseline, args.level)


if __name__ == "__main__":
    main()
