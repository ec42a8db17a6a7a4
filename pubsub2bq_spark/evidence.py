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

Known coarseness (documented, accepted):

* Oracles passed as module-level variables (``oracle=_SCD2_SQL``) are not
  part of the hash; an oracle-only edit to such a variable will not
  re-rotate the key.  Inline literals — the overwhelming majority — are.
* Helper functions called by the operator are not part of the hash; a
  behavior change confined to a shared helper will not re-rotate its
  callers.  Module-level hashing would catch it but would also flush the
  whole module's keys on any edit, starving the 50-key budget.
"""

from __future__ import annotations

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


def live_impl_hash(fn: Callable) -> str | None:
    """Hash of the registered function's current source (decorators included).

    ``inspect.getsource`` on a ``@register(...)``-decorated function returns
    the decorator lines too, so inline oracle literals participate.
    Returns None when source is unavailable (e.g. REPL-defined test stubs).
    """
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
) -> tuple[set[str], set[str]]:
    """Split evidenced keys into (fresh, stale) against live impl hashes.

    A key is *fresh* when IMPL_EVIDENCE.json records a hash equal to the
    live hash of its registered function, and the evidence kind is still
    applicable ("rows_only" evidence counts only while the key still has
    no oracle — a key that gained an oracle needs a fresh driver run).
    A key is *stale* when evidence exists but the hash differs (rewritten
    since its green row) or rows-only evidence no longer applies.
    Keys with no evidence at all appear in neither set.
    """
    evidence = load_evidence(root)
    fresh: set[str] = set()
    stale: set[str] = set()
    for key, row in evidence.items():
        if key not in registry:
            continue
        kind = row.get("kind")
        if kind == "rows_only" and registry[key].oracle is not None:
            stale.add(key)
            continue
        if row.get("hash") and row["hash"] == live_impl_hash(registry[key].spark):
            fresh.add(key)
        else:
            stale.add(key)
    return fresh, stale
