"""Stdlib line+branch coverage harness (the `ant cov` analog when
coverage.py is not installed — reference: test_suite/build.xml:16-50,
whose gcov target reports line AND branch coverage).

Uses sys.monitoring (PEP 669, Python 3.12+):

* LINE callback records each (file, line) once, then DISABLEs that
  location — steady-state overhead near zero.  Possible lines come
  from walking compiled module code objects (co_lines), the same
  universe coverage.py uses.
* BRANCH callback records each (file, branch offset, destination)
  once, then DISABLEs that direction.  The possible universe is two
  outcomes per conditional-branch instruction (POP_JUMP_IF_*,
  FOR_ITER), enumerated with dis over the same code objects.

Usage: python tools/pycov.py [pytest args...]
Writes a per-file table to stdout and COVERAGE.md at the repo root.
"""

from __future__ import annotations

import dis
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "lz4tpu")
if REPO not in sys.path:
    # `python tools/pycov.py` puts tools/ on sys.path, not the repo
    sys.path.insert(0, REPO)

hit: dict[str, set[int]] = {}
# (filename, code id, branch offset) -> set of observed destinations
bsites: dict[tuple[str, int, int], set[int]] = {}
# same key -> source line (recorded on first observation)
bline: dict[tuple[str, int, int], int] = {}
TOOL = 3  # sys.monitoring tool id (coverage slot is 1; stay clear)

_BRANCH_OPS = frozenset(
    op for op in dis.opmap
    if op.startswith("POP_JUMP_IF") or op == "FOR_ITER"
)


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        hit.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def _on_branch(code, src, dst):
    fn = code.co_filename
    if not fn.startswith(PKG):
        return sys.monitoring.DISABLE
    key = (fn, id(code), src)
    dests = bsites.setdefault(key, set())
    if not dests:
        for s, e, ln in code.co_lines():
            if ln is not None and s <= src < e:
                bline[key] = ln
                break
    dests.add(dst)
    # DISABLE turns off the whole SITE (both directions), so only
    # disable once both outcomes have been observed
    return sys.monitoring.DISABLE if len(dests) >= 2 else None


def _partial_branch_lines(path: str) -> set[int]:
    """Source lines of branch sites not covered in both directions
    (diagnostic for PYCOV_MISSING; approximate for never-hit sites,
    which are matched by bytecode offset only)."""
    lines: set[int] = set()
    for key, dests in bsites.items():
        if key[0] == path and len(dests) < 2 and key in bline:
            lines.add(bline[key])
    seen_offsets = {k[2] for k in bsites if k[0] == path}
    for code in _walk_codes(path):
        for ins in dis.get_instructions(code):
            if (ins.opname in _BRANCH_OPS
                    and ins.offset not in seen_offsets
                    and ins.positions and ins.positions.lineno):
                lines.add(ins.positions.lineno)
    return lines


def _walk_codes(path: str):
    with open(path, "rb") as f:
        srcb = f.read()
    try:
        top = compile(srcb, path, "exec")
    except SyntaxError:
        return
    stack = [top]
    while stack:
        code = stack.pop()
        yield code
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)


def _possible_lines(path: str) -> set[int]:
    lines: set[int] = set()
    for code in _walk_codes(path):
        for _start, _end, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
    return lines


def _possible_branches(path: str) -> int:
    """Two outcomes per conditional-branch instruction."""
    n = 0
    for code in _walk_codes(path):
        for ins in dis.get_instructions(code):
            if ins.opname in _BRANCH_OPS:
                n += 2
    return n


def _covered_branches(path: str) -> int:
    """Distinct (branch site, direction) pairs observed, capped at two
    per site (the BRANCH event's src offset identifies the site)."""
    return sum(
        min(len(dests), 2)
        for (fn, _cid, _src), dests in bsites.items()
        if fn == path
    )


def main() -> int:
    sys.monitoring.use_tool_id(TOOL, "pycov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.BRANCH, _on_branch
    )
    sys.monitoring.set_events(
        TOOL, sys.monitoring.events.LINE | sys.monitoring.events.BRANCH
    )

    import pytest

    rc = pytest.main(sys.argv[1:] or ["tests/", "-q"])

    sys.monitoring.set_events(TOOL, 0)
    rows = []
    tot_pos = tot_hit = tot_bp = tot_bh = 0
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            poss = _possible_lines(path)
            got = hit.get(path, set()) & poss
            bp = _possible_branches(path)
            bh = min(_covered_branches(path), bp)
            rel = os.path.relpath(path, REPO)
            rows.append((rel, len(poss), len(got), bp, bh))
            tot_pos += len(poss)
            tot_hit += len(got)
            tot_bp += bp
            tot_bh += bh

    lines = ["# Line + branch coverage (tools/pycov.py, sys.monitoring)",
             "",
             "| file | lines | covered | line % | branches | covered | branch % |",
             "|---|---:|---:|---:|---:|---:|---:|"]
    for rel, poss, got, bp, bh in rows:
        lpct = 100.0 * got / poss if poss else 100.0
        bpct = 100.0 * bh / bp if bp else 100.0
        lines.append(f"| {rel} | {poss} | {got} | {lpct:.1f} "
                     f"| {bp} | {bh} | {bpct:.1f} |")
    lpct = 100.0 * tot_hit / tot_pos if tot_pos else 0.0
    bpct = 100.0 * tot_bh / tot_bp if tot_bp else 0.0
    lines.append(f"| **total** | **{tot_pos}** | **{tot_hit}** "
                 f"| **{lpct:.1f}** | **{tot_bp}** | **{tot_bh}** "
                 f"| **{bpct:.1f}** |")
    report = "\n".join(lines) + "\n"
    print(report)
    want = os.environ.get("PYCOV_MISSING")
    if want:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                path = os.path.join(root, f)
                if not f.endswith(".py") or want not in path:
                    continue
                poss = _possible_lines(path)
                missing = sorted(poss - hit.get(path, set()))
                print(f"-- {os.path.relpath(path, REPO)} missing "
                      f"lines: {missing}")
                print(f"-- partially-covered branch lines: "
                      f"{sorted(_partial_branch_lines(path))}")
    with open(os.path.join(REPO, "COVERAGE.md"), "w") as f:
        f.write(report)
    print(f"wrote COVERAGE.md (lines {lpct:.1f}%, branches {bpct:.1f}%)",
          file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
