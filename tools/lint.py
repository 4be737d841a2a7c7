#!/usr/bin/env python
"""Static lint gate (the reference gates CI on fmt + clippy-deny-warnings,
justfile:9-17; SURVEY.md §5 planned mypy/ruff analogs — neither tool is
installed in this environment, so this is a self-contained AST checker).

Checks (each an error; exit 1 on any finding):
  * unused imports (module scope)
  * duplicate top-level def/class names in a module
  * mutable default arguments (list/dict/set literals)
  * bare ``except:``
  * ``assert (x, msg)`` — always-true tuple assert
  * f-strings without placeholders
  * comparison to True/False/None with == / !=

Usage: python tools/lint.py [paths...]   (defaults to retto_tpu/ tools/ tests/)
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


class Finding:
    def __init__(self, path: Path, line: int, code: str, msg: str):
        self.path, self.line, self.code, self.msg = path, line, code, msg

    def __str__(self) -> str:
        return f"{self.path}:{self.line}: {self.code} {self.msg}"


def _names_loaded(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root name of dotted access
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def check_file(path: Path) -> list[Finding]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [Finding(path, e.lineno or 0, "E999", f"syntax error: {e.msg}")]

    out: list[Finding] = []
    used = _names_loaded(tree)
    # format specs (":.1f") are nested JoinedStr nodes — not real f-strings
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    has_all = any(
        isinstance(n, ast.Assign)
        and any(isinstance(t, ast.Name) and t.id == "__all__" for t in n.targets)
        for n in tree.body
    )
    all_names: set[str] = set()
    if has_all:
        for n in tree.body:
            if isinstance(n, ast.Assign) and any(
                isinstance(t, ast.Name) and t.id == "__all__" for t in n.targets
            ):
                try:
                    all_names = set(ast.literal_eval(n.value))
                except ValueError:
                    pass

    # ---- unused module-scope imports -------------------------------- #
    is_init = path.name == "__init__.py"
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if is_init or name in all_names:
                    continue
                if name not in used:
                    out.append(
                        Finding(path, node.lineno, "F401", f"unused import '{name}'")
                    )
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if is_init or name in all_names:
                    continue
                if name not in used:
                    out.append(
                        Finding(path, node.lineno, "F401", f"unused import '{name}'")
                    )

    # ---- duplicate top-level definitions ----------------------------- #
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                out.append(
                    Finding(
                        path,
                        node.lineno,
                        "F811",
                        f"redefinition of '{node.name}' (first at line {seen[node.name]})",
                    )
                )
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        # ---- mutable default args ------------------------------------ #
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + list(node.args.kw_defaults):
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    out.append(
                        Finding(
                            path, d.lineno, "B006", "mutable default argument"
                        )
                    )
        # ---- bare except ---------------------------------------------- #
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append(Finding(path, node.lineno, "E722", "bare 'except:'"))
        # ---- assert on a non-empty tuple ------------------------------ #
        elif isinstance(node, ast.Assert) and isinstance(node.test, ast.Tuple):
            if node.test.elts:
                out.append(
                    Finding(path, node.lineno, "F631", "assert on tuple is always true")
                )
        # ---- f-string without placeholders ---------------------------- #
        elif isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                out.append(
                    Finding(path, node.lineno, "F541", "f-string without placeholders")
                )
        # ---- == None / == True / == False ----------------------------- #
        elif isinstance(node, ast.Compare):
            for op, cmp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(
                    cmp, ast.Constant
                ) and (cmp.value is None or cmp.value is True or cmp.value is False):
                    out.append(
                        Finding(
                            path,
                            node.lineno,
                            "E711",
                            f"comparison to {cmp.value} with ==/!= (use 'is')",
                        )
                    )
    return out


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in argv] or [
        Path("retto_tpu"), Path("tools"), Path("tests"),
        Path("bench.py"), Path("__graft_entry__.py"),
    ]
    files: list[Path] = []
    for r in roots:
        files.extend(sorted(r.rglob("*.py")) if r.is_dir() else [r])
    findings: list[Finding] = []
    for f in files:
        findings.extend(check_file(f))
    for fd in findings:
        print(fd)
    print(f"lint: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
