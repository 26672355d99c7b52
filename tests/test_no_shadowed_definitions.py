"""Guard against shadowed top-level definitions (VERDICT r3 #1: a
pasted duplicate of the reranker/triplet block silently shadowed the
fixed copy, making a committed fix dead code). Python binds the LAST
definition, so a duplicated def/class/constant is a live booby trap:
edits to the first copy do nothing. This meta-test fails the build the
moment any module grows a second top-level binding of the same name."""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "spec_search_spark"


def _top_level_bindings(tree: ast.Module):
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            yield node.name, node.lineno
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    yield t.id, node.lineno
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            # annotated bindings (`_MEMO: dict = {}`) are the memo-dict
            # idiom this guard most needs to cover
            if node.value is not None:
                yield node.target.id, node.lineno


def test_no_module_shadows_its_own_definitions():
    offenders = []
    for p in sorted(PKG.rglob("*.py")):
        seen: dict[str, int] = {}
        for name, lineno in _top_level_bindings(ast.parse(p.read_text())):
            if name in seen:
                offenders.append(f"{p}:{lineno} re-binds {name!r} (first at :{seen[name]})")
            seen[name] = lineno
    assert not offenders, "\n".join(offenders)
