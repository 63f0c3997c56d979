"""Stdlib line-coverage harness (the `ant cov` analog when coverage.py
is not installed — reference: test_suite/build.xml:16-50).

Uses sys.monitoring (PEP 669, Python 3.12+): a LINE callback records
each (file, line) once and then returns DISABLE for that location, so
steady-state overhead is near zero.  Possible lines come from walking
the compiled module code objects (co_lines), the same universe
coverage.py uses.

Usage: python tools/pycov.py [pytest args...]
Writes a per-file table to stdout and COVERAGE.md at the repo root.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "lz4tpu")
if REPO not in sys.path:
    # `python tools/pycov.py` puts tools/ on sys.path, not the repo
    sys.path.insert(0, REPO)

hit: dict[str, set[int]] = {}
TOOL = 3  # sys.monitoring tool id (coverage slot is 1; stay clear)


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        hit.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def _possible_lines(path: str) -> set[int]:
    with open(path, "rb") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _start, _end, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main() -> int:
    sys.monitoring.use_tool_id(TOOL, "pycov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    rc = pytest.main(sys.argv[1:] or ["tests/", "-q"])

    sys.monitoring.set_events(TOOL, 0)
    rows = []
    tot_pos = tot_hit = 0
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            poss = _possible_lines(path)
            got = hit.get(path, set()) & poss
            rel = os.path.relpath(path, REPO)
            rows.append((rel, len(poss), len(got)))
            tot_pos += len(poss)
            tot_hit += len(got)

    lines = ["# Line coverage (tools/pycov.py, sys.monitoring)",
             "",
             "| file | lines | covered | % |",
             "|---|---:|---:|---:|"]
    for rel, poss, got in rows:
        pct = 100.0 * got / poss if poss else 100.0
        lines.append(f"| {rel} | {poss} | {got} | {pct:.1f} |")
    pct = 100.0 * tot_hit / tot_pos if tot_pos else 0.0
    lines.append(f"| **total** | **{tot_pos}** | **{tot_hit}** "
                 f"| **{pct:.1f}** |")
    report = "\n".join(lines) + "\n"
    print(report)
    with open(os.path.join(REPO, "COVERAGE.md"), "w") as f:
        f.write(report)
    print(f"wrote COVERAGE.md (total {pct:.1f}%)", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
