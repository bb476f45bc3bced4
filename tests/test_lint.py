"""Static-quality gates (the reference's `mypy src` + `flake8 src` dev
contract, tests/Development-README.md:19-24).

mypy/ruff are not available in every environment, so this enforces a
built-in AST gate unconditionally (syntax + unused-import hygiene, the most
common flake8 F401 class) and runs the real tools when importable.
"""

import ast
import pathlib
import shutil
import subprocess
import sys

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "convexadam_tpu"
SOURCES = sorted(PKG.rglob("*.py"))


def test_sources_found():
    assert len(SOURCES) > 30


def test_all_sources_parse():
    for path in SOURCES:
        ast.parse(path.read_text(), filename=str(path))


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root name of dotted access (np.float32 → np)
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def test_no_unused_imports():
    """flake8 F401 equivalent (module-level imports only; __init__.py
    re-export surfaces are exempt, as are `import x as x` re-exports)."""
    offenders = []
    for path in SOURCES:
        if path.name == "__init__.py":
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        used = _used_names(tree)
        # names referenced in __all__ strings count as used
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                used.add(node.value)
        for node in tree.body:
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = (alias.asname or alias.name).split(".")[0]
                    if name not in used:
                        offenders.append(f"{path.name}: import {alias.name}")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    name = alias.asname or alias.name
                    if name not in used:
                        offenders.append(
                            f"{path.name}: from {node.module} import {alias.name}"
                        )
    assert not offenders, "unused imports:\n" + "\n".join(offenders)


@pytest.mark.skipif(shutil.which("ruff") is None, reason="ruff not installed")
def test_ruff_clean():
    r = subprocess.run(
        ["ruff", "check", str(PKG)], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.skipif(
    not any((pathlib.Path(p) / "mypy").exists() for p in sys.path if p)
    and shutil.which("mypy") is None,
    reason="mypy not installed",
)
def test_mypy_clean():
    r = subprocess.run(
        ["mypy", str(PKG)], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr
