"""Stdlib AST lint — the subset of the reference's ruff gate
(/root/reference/.github/workflows/ci.yml:16-49) that catches real bugs
and needs no third-party install:

* syntax errors (parse failure fails the run);
* unused imports (module- and function-level, F401);
* duplicate top-level def/class names (copy-paste shadowing, F811);
* mutable default arguments (B006).

Usage: python scripts/lint_basic.py <package_dir> [...]; exit 1 on any
finding.
"""

from __future__ import annotations

import ast
import os
import sys


def _imports(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node, a, (a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                yield node, a, (a.asname or a.name)


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    return used


def lint_file(path: str) -> list[str]:
    src = open(path, encoding="utf-8").read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    out: list[str] = []
    lines = src.splitlines()

    def noqa(lineno: int) -> bool:
        return 0 < lineno <= len(lines) and "# noqa" in lines[lineno - 1]

    used = _used_names(tree)
    # names exported via __all__ or re-exported with "as" count as used
    explicit = {
        getattr(c, "value", None)
        for n in ast.walk(tree)
        if isinstance(n, ast.Assign)
        for t in n.targets
        if isinstance(t, ast.Name) and t.id == "__all__"
        for c in ast.walk(n.value)
        if isinstance(c, ast.Constant)
    }
    for node, alias, bound in _imports(tree):
        if bound in used or bound in explicit or noqa(node.lineno):
            continue
        if alias.asname and alias.asname == alias.name:
            continue  # explicit re-export convention (import x as x)
        if alias.name.startswith("_") or bound == "annotations":
            continue
        # a bare "import a.b" also binds "a"; usage of "a" was checked
        out.append(f"{path}:{node.lineno}: unused import {bound!r} (F401)")

    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            if node.name in seen and not any(
                isinstance(d, ast.Name)
                and d.id in ("overload", "property")
                for d in node.decorator_list
            ):
                out.append(
                    f"{path}:{node.lineno}: duplicate top-level "
                    f"definition {node.name!r} "
                    f"(first at line {seen[node.name]}) (F811)"
                )
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    out.append(
                        f"{path}:{node.lineno}: mutable default argument "
                        f"in {node.name!r} (B006)"
                    )
    return out


def main(argv: list[str]) -> int:
    findings: list[str] = []
    for root_arg in argv or ["data_pipeline_spark"]:
        for root, _dirs, files in os.walk(root_arg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    findings.extend(lint_file(os.path.join(root, fn)))
    for f in findings:
        print(f)
    print(f"lint_basic: {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
