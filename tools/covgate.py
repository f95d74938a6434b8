#!/usr/bin/env python
"""Stdlib line-coverage gate — the CI role of grcov -> Coveralls in the
reference (`/root/reference/.github/workflows/ci.yml:71-117`), built on
PEP 669 (sys.monitoring): the LINE callback returns DISABLE after the first
hit of each location, so overhead after warmup is near zero.

Usage:  python -m tools.covgate FLOOR_PCT [pytest args...]
Runs pytest in-process with coverage of probly_search_tpu/, prints a
per-file table, and exits non-zero if total line coverage < FLOOR_PCT.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "probly_search_tpu"
_PREFIX = str(PKG) + os.sep
_hits: set = set()

TOOL = sys.monitoring.COVERAGE_ID


def _on_line(code, line):
    if code.co_filename.startswith(_PREFIX):
        _hits.add((code.co_filename, line))
    return sys.monitoring.DISABLE


def start() -> None:
    sys.monitoring.use_tool_id(TOOL, "covgate")
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)


def _executable_lines(path: Path) -> set:
    code = compile(path.read_text(encoding="utf-8"), str(path), "exec")
    lines = set()
    stack = [code]
    while stack:
        c = stack.pop()
        lines.update(ln for _, _, ln in c.co_lines() if ln)
        stack.extend(k for k in c.co_consts if hasattr(k, "co_lines"))
    return lines


def report(floor_pct: float) -> int:
    covered_by_file = {}
    for fn, line in _hits:
        covered_by_file.setdefault(fn, set()).add(line)
    total_exec = total_cov = 0
    rows = []
    for path in sorted(PKG.rglob("*.py")):
        ex = _executable_lines(path)
        cov = covered_by_file.get(str(path), set()) & ex
        total_exec += len(ex)
        total_cov += len(cov)
        pct = 100.0 * len(cov) / len(ex) if ex else 100.0
        rows.append((pct, f"{path.relative_to(PKG.parent)}: {len(cov)}/{len(ex)} ({pct:.0f}%)"))
    for _, row in sorted(rows):
        print(row)
    pct = 100.0 * total_cov / total_exec if total_exec else 100.0
    print(f"TOTAL line coverage: {total_cov}/{total_exec} = {pct:.1f}% (floor {floor_pct}%)")
    return 0 if pct >= floor_pct else 1


def main(argv) -> int:
    """covgate FLOOR [--cum F | --gate-only F] [pytest args...]

    --cum F       run the tests, union the hit set into F, do NOT gate.
                  The suite runs ONE FILE PER PROCESS: XLA:CPU segfaults
                  in backend_compile_and_load once enough large programs
                  (window compositions, the sharded window) have been
                  compiled in one process — position-dependent, every
                  file passes alone (r7; see ci.sh / CLAUDE.md).
    --gate-only F no pytest; load F and gate on the accumulated union.
    """
    import json

    floor = float(argv[1])
    args = argv[2:]
    cum = gate_only = None
    if args and args[0] == "--cum":
        cum, args = args[1], args[2:]
    elif args and args[0] == "--gate-only":
        gate_only, args = args[1], args[2:]
    if gate_only:
        with open(gate_only) as f:
            _hits.update((fn, ln) for fn, ln in json.load(f))
        return report(floor)
    pytest_args = args or ["tests/", "-q"]
    start()
    import pytest

    rc = pytest.main(pytest_args)
    if rc != 0:
        return int(rc)
    if cum:
        if os.path.exists(cum):
            with open(cum) as f:
                _hits.update((fn, ln) for fn, ln in json.load(f))
        with open(cum, "w") as f:
            json.dump([[fn, ln] for fn, ln in _hits], f)
        print(f"covgate: union now {len(_hits)} hits in {cum} (gate deferred)")
        return 0
    return report(floor)


if __name__ == "__main__":
    sys.exit(main(sys.argv))
