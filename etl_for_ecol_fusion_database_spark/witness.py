"""Change-aware witness fingerprints for the driver CORRECTNESS rotation.

Round-6 gap (VERDICT.md "Next round" #1): the rotation in
``__spark_entry__`` treated "any sheet ever showed hash-PASS" as
witnessed, so a query whose implementation or oracle changed AFTER its
last green row kept its stale witness and never re-entered the 50-slot
sample window — 16 queries hit exactly that in round 6 and had to be
re-verified by hand.

This module makes witness bookkeeping content-aware.  Each registered
query gets a deterministic fingerprint over

- its oracle SQL text (``registry.ORACLES``),
- the source of its registered callable (decorator line included, so
  inline oracles and parameter tweaks are caught),
- recursively (bounded depth), the source of every package-internal
  function/class the callable references and the repr of every primitive
  package-internal constant it references, and
- for every package-internal MODULE it references (e.g. the
  ``operators.similarity`` handle inside ``x2_knn_join``), the md5 of
  that module file plus its transitive intra-package imports — an
  operator-layer edit invalidates exactly the queries that use that
  operator.

``scripts/update_witness_fp.py`` snapshots fingerprints into
``docs/WITNESS_FP.json`` at round start (when the newest CORRECTNESS
sheet was produced against the committed = current tree).  The rotation
then counts a name as witnessed only while its recorded fingerprint
still matches — any mid-round edit flips the comparison and the query
rotates back into the sample window automatically.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import types
from collections.abc import Callable

_PKG_NAME = __name__.rsplit(".", 1)[0]
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_PKG_DIR)

#: committed fingerprint snapshot consumed by __spark_entry__._witnessed_names
RECORDED_PATH = os.path.join(_REPO_DIR, "docs", "WITNESS_FP.json")

#: how deep to follow function -> referenced-function chains.  Depth 3
#: covers query fn -> registry helper (_t) -> package function
#: (catalog.load_table) -> its own referenced constants; module handles
#: terminate immediately in a whole-file hash so depth never explodes.
_MAX_DEPTH = 3

_PRIMITIVES = (str, bytes, int, float, bool, type(None))


def _is_pkg_module(mod: types.ModuleType | None) -> bool:
    name = getattr(mod, "__name__", "") or ""
    return name == _PKG_NAME or name.startswith(_PKG_NAME + ".")


def _module_file(modname: str) -> str | None:
    rel = modname[len(_PKG_NAME) :].lstrip(".").replace(".", os.sep)
    for cand in (
        os.path.join(_PKG_DIR, rel + ".py"),
        os.path.join(_PKG_DIR, rel, "__init__.py"),
        os.path.join(_PKG_DIR, "__init__.py") if not rel else None,
    ):
        if cand and os.path.isfile(cand):
            return cand
    return None


_FILE_MD5_MEMO: dict[str, str] = {}


def _file_md5(path: str) -> str:
    got = _FILE_MD5_MEMO.get(path)
    if got is None:
        with open(path, "rb") as fh:
            got = hashlib.md5(fh.read()).hexdigest()
        _FILE_MD5_MEMO[path] = got
    return got


_INTRA_IMPORTS_MEMO: dict[str, frozenset[str]] = {}


def _intra_imports(modname: str) -> frozenset[str]:
    """Package-internal modules directly imported by ``modname`` (AST-level,
    so this never executes anything and sees the file as committed)."""
    got = _INTRA_IMPORTS_MEMO.get(modname)
    if got is not None:
        return got
    path = _module_file(modname)
    found: set[str] = set()
    if path is not None:
        tree = ast.parse(open(path, "rb").read())
        pkg_parts = modname.split(".")
        is_pkg_init = path.endswith("__init__.py")
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(_PKG_NAME):
                        found.add(alias.name)
            elif isinstance(node, ast.ImportFrom):
                if node.level:
                    # relative: level 1 from inside a module means "this
                    # module's package"; each extra level climbs one more
                    base_parts = pkg_parts[: len(pkg_parts) - node.level + (1 if is_pkg_init else 0)]
                    base = ".".join(base_parts)
                else:
                    base = node.module or ""
                    if not base.startswith(_PKG_NAME):
                        continue
                if node.level and node.module:
                    base = f"{base}.{node.module}" if base else node.module
                if base.startswith(_PKG_NAME):
                    found.add(base)
                    # "from .operators import dedup" imports submodules too
                    for alias in node.names:
                        sub = f"{base}.{alias.name}"
                        if _module_file(sub) is not None:
                            found.add(sub)
    got = frozenset(m for m in found if _module_file(m) is not None)
    _INTRA_IMPORTS_MEMO[modname] = got
    return got


def _module_closure_hashes(modname: str) -> list[str]:
    """md5 of ``modname``'s file and every package file it transitively
    imports — the terminal fingerprint contribution of a module handle."""
    seen: set[str] = set()
    stack = [modname]
    hashes: list[str] = []
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        path = _module_file(m)
        if path is None:
            continue
        hashes.append(f"{m}={_file_md5(path)}")
        stack.extend(_intra_imports(m))
    return sorted(hashes)


def _unwrap(fn: Callable) -> Callable:
    """Peel the registry's ``wrapped`` closure down to the decorated fn."""
    seen = 0
    while seen < 5:
        seen += 1
        unwrapped = getattr(fn, "__wrapped__", None)
        if unwrapped is not None:
            fn = unwrapped
            continue
        cells = getattr(fn, "__closure__", None) or ()
        inner = [
            c.cell_contents
            for c in cells
            if isinstance(c.cell_contents, types.FunctionType)
            and c.cell_contents.__module__ is not None
            and c.cell_contents.__module__.startswith(_PKG_NAME)
        ]
        # the registry decorator copies __name__ onto its wrapper, so the
        # reliable marker is the untouched __qualname__
        if len(inner) == 1 and "wrapped" in getattr(fn, "__qualname__", ""):
            fn = inner[0]
            continue
        break
    return fn


def _referenced(fn: Callable) -> dict[str, object]:
    """Objects the function body can reach by name: globals named in
    ``co_names`` plus closure free variables."""
    out: dict[str, object] = {}
    code = getattr(fn, "__code__", None)
    if code is None:
        return out
    g = getattr(fn, "__globals__", {})
    for name in code.co_names:
        if name in g:
            out[name] = g[name]
    for name, cell in zip(
        code.co_freevars, getattr(fn, "__closure__", None) or ()
    ):
        try:
            out[name] = cell.cell_contents
        except ValueError:
            pass
    return out


def _collect(obj: object, parts: set[str], visited: set[int], depth: int) -> None:
    if id(obj) in visited or depth > _MAX_DEPTH:
        return
    visited.add(id(obj))
    if isinstance(obj, types.ModuleType):
        if _is_pkg_module(obj):
            for h in _module_closure_hashes(obj.__name__):
                parts.add("mod:" + h)
        return
    if isinstance(obj, (types.FunctionType, type)):
        mod = getattr(obj, "__module__", "") or ""
        if not (mod == _PKG_NAME or mod.startswith(_PKG_NAME + ".")):
            return
        try:
            parts.add(f"src:{mod}.{obj.__qualname__}:" + inspect.getsource(obj))
        except (OSError, TypeError):
            parts.add(f"obj:{mod}.{getattr(obj, '__qualname__', repr(obj))}")
        if isinstance(obj, types.FunctionType):
            for sub in _referenced(obj).values():
                _collect(sub, parts, visited, depth + 1)
        return
    if isinstance(obj, _PRIMITIVES):
        parts.add("val:" + repr(obj))
        return
    if isinstance(obj, (set, frozenset)):
        # set repr order is hash-randomized across processes — sort first
        try:
            parts.add("val:" + repr(sorted(obj, key=repr)))
        except Exception:
            pass
        return
    if isinstance(obj, (tuple, list, dict)):
        try:
            parts.add("val:" + repr(obj))
        except Exception:
            pass


def query_fingerprint(name: str) -> str:
    """Deterministic content fingerprint of one registered query (see
    module docstring for exactly what it covers)."""
    from . import registry

    fn = _unwrap(registry.QUERIES[name])
    parts: set[str] = {"oracle:" + registry.ORACLES.get(name, "<rows-only>")}
    try:
        parts.add("src:" + inspect.getsource(fn))
    except (OSError, TypeError):
        parts.add("obj:" + repr(fn))
    visited: set[int] = set()
    for obj in _referenced(fn).values():
        _collect(obj, parts, visited, depth=1)
    h = hashlib.md5()
    for p in sorted(parts):
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()


_ALL_FP_MEMO: dict[str, str] | None = None


def current_fingerprints() -> dict[str, str]:
    """Fingerprints for every registered query, memoized per process
    (sources are immutable for a process lifetime)."""
    global _ALL_FP_MEMO
    if _ALL_FP_MEMO is None:
        from . import registry

        out: dict[str, str] = {}
        for name in registry.QUERIES:
            try:
                out[name] = query_fingerprint(name)
            except Exception:
                # a fingerprinting failure must degrade toward "unwitnessed"
                # (the safe direction), never crash the driver contract
                out[name] = "<fingerprint-error>"
        _ALL_FP_MEMO = out
    return _ALL_FP_MEMO


def recorded_fingerprints() -> dict[str, str]:
    """The committed snapshot (docs/WITNESS_FP.json); {} when absent."""
    try:
        with open(RECORDED_PATH) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}


def stale_names() -> frozenset[str]:
    """Queries whose current fingerprint differs from (or is absent from)
    the recorded snapshot — i.e. whose last driver witness, if any, no
    longer covers the current code.

    With NO snapshot at all (docs/WITNESS_FP.json missing/unreadable) this
    returns the empty set: degrading to the pre-round-7 rotation beats
    marking all 184 entries stale and wedging the 50-slot sample window on
    the same block forever."""
    recorded = recorded_fingerprints()
    if not recorded:
        return frozenset()
    current = current_fingerprints()
    return frozenset(
        n for n, fp in current.items() if recorded.get(n) != fp
    )
