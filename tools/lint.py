#!/usr/bin/env python
"""Minimal stdlib linter — the CI role of rustfmt --check + clippy -D warnings
in the reference (`/root/reference/.github/workflows/ci.yml:44-69`), with no
third-party tools available in this environment.

Checks (all hard failures, clippy-style):
  * syntax (via ast.parse)
  * unused imports (module scope and function scope)
  * tabs in indentation, trailing whitespace, missing final newline
  * lines longer than 100 characters
  * bare `except:`
  * `print(` calls inside the library package (diagnostics belong in
    logging/metrics; benches and tools may print)
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100
LIB_PREFIX = "probly_search_tpu/"


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c -> record the root name via the Name child (walk covers it)
            pass
    return used


def check_file(path: Path) -> list:
    problems = []
    rel = path.as_posix()
    src = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(src, filename=rel)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]

    lines = src.split("\n")
    if src and not src.endswith("\n"):
        problems.append(f"{rel}:{len(lines)}: missing final newline")
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        if len(line) > MAX_LINE:
            problems.append(f"{rel}:{i}: line longer than {MAX_LINE} chars ({len(line)})")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t") or (line[: len(line) - len(line.lstrip())].count("\t")):
            problems.append(f"{rel}:{i}: tab in indentation")

    used = _used_names(tree)
    # __all__ re-exports count as used.
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                                used.add(elt.value)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if name not in used and not (a.asname is None and "." in a.name):
                    problems.append(f"{rel}:{node.lineno}: unused import '{name}'")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                name = a.asname or a.name
                if name != "*" and name not in used:
                    problems.append(f"{rel}:{node.lineno}: unused import '{name}'")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{rel}:{node.lineno}: bare 'except:'")
        elif (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
            and rel.startswith(LIB_PREFIX)
        ):
            problems.append(f"{rel}:{node.lineno}: print() in library code")
    return problems


def main(argv):
    root = Path(argv[1]) if len(argv) > 1 else Path(".")
    targets = []
    for pat in (
        "probly_search_tpu/**/*.py",
        "tests/**/*.py",
        "benchmarks/**/*.py",
        "tools/**/*.py",
        "bench.py",
        "__graft_entry__.py",
    ):
        targets.extend(sorted(root.glob(pat)))
    problems = []
    for path in targets:
        problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(f"lint: {len(targets)} files, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
