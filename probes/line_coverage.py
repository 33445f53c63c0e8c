"""Local line-coverage audit via sys.monitoring (PEP 669) — no coverage pkg.

The image has no ``coverage``/``pytest-cov``; CI owns the enforced gate
(pyproject ``fail_under``).  This probe measures LINE coverage of
``sqd_tpu/`` over the full test suite locally so uncovered lines can be
audited (tested or pragma'd) without waiting for CI.

    python probes/line_coverage.py [pytest args...]

Writes per-file uncovered-line lists to probes/logs/coverage_report.txt.
sys.monitoring LINE events are DISABLE-able per location after first hit, so
the overhead is a fraction of sys.settrace tracing.  Lines are normalized
against each file's executable-line set derived from the compiled code
objects (same basis coverage.py uses), so docstrings/blank lines don't count.
"""

from __future__ import annotations

import dis
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "sqd_tpu")
TOOL = sys.monitoring.COVERAGE_ID

hit: dict[str, set[int]] = defaultdict(set)


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        hit[fn].add(line)
    return sys.monitoring.DISABLE  # one hit per location is enough


def _executable_lines(path: str) -> set[int]:
    """All line numbers the compiler emits code for (recursively)."""
    with open(path, "rb") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        co = stack.pop()
        lines.update(l for _, _, l in co.co_lines() if l)
        for const in co.co_consts:
            if isinstance(const, type(top)):
                stack.append(const)
    return lines


def main() -> int:
    sys.monitoring.use_tool_id(TOOL, "sqd-line-cov")
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["tests/", "-q", "-x"]
    rc = pytest.main(args)

    sys.monitoring.set_events(TOOL, 0)
    os.makedirs(os.path.join(REPO, "probes", "logs"), exist_ok=True)
    report = os.path.join(REPO, "probes", "logs", "coverage_report.txt")
    total_exec = total_hit = 0
    rows = []
    for root, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            ex = _executable_lines(path)
            got = hit.get(path, set()) & ex
            missing = sorted(ex - got)
            total_exec += len(ex)
            total_hit += len(got)
            pct = 100.0 * len(got) / len(ex) if ex else 100.0
            rows.append((pct, path, len(ex), missing))
    rows.sort()
    with open(report, "w") as f:
        for pct, path, nex, missing in rows:
            rel = os.path.relpath(path, REPO)
            f.write(f"{pct:6.1f}%  {rel}  ({nex - len(missing)}/{nex})\n")
            if missing:
                f.write(f"        missing: {_ranges(missing)}\n")
        overall = 100.0 * total_hit / max(total_exec, 1)
        f.write(f"\nTOTAL {overall:.2f}% ({total_hit}/{total_exec} lines)\n")
    print(f"line coverage: {100.0 * total_hit / max(total_exec, 1):.2f}% "
          f"-> {report}")
    return rc


def _ranges(lines: list[int]) -> str:
    out, start, prev = [], None, None
    for ln in lines:
        if start is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            out.append(f"{start}-{prev}" if prev > start else str(start))
            start = prev = ln
    if start is not None:
        out.append(f"{start}-{prev}" if prev > start else str(start))
    return ", ".join(out)


if __name__ == "__main__":
    raise SystemExit(main())
