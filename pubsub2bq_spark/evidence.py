"""Implementation-hash evidence for the driver rotation.

The driver's capped per-round correctness run should spend its budget on
keys whose evidence is missing OR stale.  A CORRECTNESS_rN.json green row
only proves the implementation *as of round N*; if the operator is later
rewritten, the row is stale and the key must re-rotate forward (VERDICT r4
"What's wrong" #1, ADVICE r4 #3).

Mechanism: each key's evidence is keyed on an **implementation hash** —
sha256 of the registered function's source text *including its decorator
lines* (so inline oracle literals are covered too).  ``IMPL_EVIDENCE.json``
at the repo root records, per key, the hash the latest driver-green row
actually tested (computed from the git tree of the commit that added that
round's CORRECTNESS file — see scripts/impl_evidence.py).  At runtime the
rotation treats a key as green only when its recorded hash equals the
live hash.

The hash covers the registered function's source INCLUDING its decorator
lines (so inline oracle literals participate) PLUS the transitive closure
of same-module top-level symbols it references — helper functions and
module constants — extracted by AST so the live and historic sides use
byte-identical machinery.  A rewrite confined to a same-module helper
(the r4 ``token_entropy`` case) therefore re-rotates its callers.

Known coarseness (documented, accepted):

* Cross-module helpers (``tables.load`` / ``materialize`` etc.) are not
  part of the hash; a behavior change there does not re-rotate callers.
  Including them would flush most of the registry on any shared-infra
  edit, starving the 50-key budget.
* Oracles passed as module-level variables ARE covered when the variable
  is referenced from the decorated function's module scope text (it is a
  referenced module symbol), but oracle strings built by module-level
  helper CALLS executed at import time hash the helper's source, not the
  produced string.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
from typing import Any, Callable

EVIDENCE_FILE = "IMPL_EVIDENCE.json"


def _normalize(src: str) -> str:
    return "\n".join(line.rstrip() for line in src.splitlines()).strip()


def impl_hash_of_source(src: str) -> str:
    return hashlib.sha256(_normalize(src).encode("utf-8")).hexdigest()


def unwrap_registered(fn: Callable) -> Callable:
    """Peel the registry's functools.wraps shim to the author's function."""
    while hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    return fn


def _toplevel_symbols(tree: ast.Module, lines: list[str]) -> dict[str, tuple[str, set[str]]]:
    """{name: (source_segment, referenced_names)} for module-level defs
    and simple constant assignments."""
    out: dict[str, tuple[str, set[str]]] = {}

    def seg(node: ast.stmt) -> str:
        start = node.lineno
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.decorator_list:
            start = min(start, *[d.lineno for d in node.decorator_list])
        return "\n".join(lines[start - 1 : node.end_lineno])

    def refs(node: ast.stmt) -> set[str]:
        return {
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        }

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            out[node.name] = (seg(node), refs(node))
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out[tgt.id] = (seg(node), refs(node))
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out[node.target.id] = (seg(node), refs(node))
    return out


def closure_source(module_src: str, fn_name: str) -> str | None:
    """The function's source (decorators included) followed by the
    sources of every same-module top-level symbol it transitively
    references, sorted by name — the text the implementation hash
    covers.  None when the function is not a top-level def here."""
    try:
        tree = ast.parse(module_src)
    except SyntaxError:
        return None
    lines = module_src.splitlines()
    symbols = _toplevel_symbols(tree, lines)
    if fn_name not in symbols:
        return None
    seen: set[str] = set()
    frontier = [fn_name]
    while frontier:
        name = frontier.pop()
        if name in seen or name not in symbols:
            continue
        seen.add(name)
        frontier.extend(symbols[name][1] - seen)
    parts = [symbols[fn_name][0]] + [
        symbols[n][0] for n in sorted(seen - {fn_name})
    ]
    return "\n\x00\n".join(parts)


def live_impl_hash(fn: Callable) -> str | None:
    """Hash of the registered function's current closure source (the
    function + same-module helpers/constants it references).  Falls back
    to the bare function source for non-top-level defs (test stubs);
    None when source is unavailable entirely."""
    fn = unwrap_registered(fn)
    try:
        module_src = inspect.getsource(inspect.getmodule(fn))
        src = closure_source(module_src, fn.__name__)
        if src is not None:
            return impl_hash_of_source(src)
        return impl_hash_of_source(inspect.getsource(fn))
    except (OSError, TypeError):
        return None


def live_fn_hash(fn: Callable) -> str | None:
    """Hash of ONLY the registered function's own source (decorators
    included) — the narrow hash that distinguishes strong staleness (the
    operator itself was rewritten) from weak staleness (only a referenced
    same-module helper/constant moved)."""
    try:
        return impl_hash_of_source(inspect.getsource(unwrap_registered(fn)))
    except (OSError, TypeError):
        return None


def live_hashes(registry: dict[str, Any]) -> dict[str, str | None]:
    return {key: live_impl_hash(q.spark) for key, q in registry.items()}


def load_evidence(root: str) -> dict[str, dict[str, Any]]:
    """Read IMPL_EVIDENCE.json ({key: {round, hash, kind}}); {} if absent."""
    path = os.path.join(root, EVIDENCE_FILE)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in data.items() if isinstance(v, dict)}


def fresh_green_keys(
    registry: dict[str, Any], root: str
) -> tuple[set[str], set[str], set[str]]:
    """Split evidenced keys into (fresh, strong_stale, weak_stale).

    *Fresh*: IMPL_EVIDENCE.json records a closure hash equal to the live
    hash of the registered function (and "rows_only" evidence still
    applies — it counts only while the key has no oracle).
    *Strong-stale*: the operator's OWN source changed since its green row
    (fn_hash mismatch) — highest re-check priority.
    *Weak-stale*: only referenced same-module helpers/constants changed
    (closure mismatch with fn_hash intact) — lower priority; behavior may
    have drifted but the operator text is the proven one.
    Keys with no evidence at all appear in none of the sets.
    """
    evidence = load_evidence(root)
    fresh: set[str] = set()
    strong: set[str] = set()
    weak: set[str] = set()
    for key, row in evidence.items():
        if key not in registry:
            continue
        kind = row.get("kind")
        if kind == "rows_only" and registry[key].oracle is not None:
            strong.add(key)
            continue
        if row.get("hash") and row["hash"] == live_impl_hash(registry[key].spark):
            fresh.add(key)
        elif row.get("fn_hash") and row["fn_hash"] == live_fn_hash(
            registry[key].spark
        ):
            weak.add(key)
        else:
            strong.add(key)
    return fresh, strong, weak
