#!/usr/bin/env python
"""Generate docs/OPERATORS.md from the query registry (single source of
truth): key, semantics, oracle coverage, and 100 TB scale notes."""

from __future__ import annotations

import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubsub2bq_spark.registry import all_queries  # noqa: E402


def render() -> str:
    qs = all_queries()
    lines = [
        "# Operator inventory (generated — do not edit)",
        "",
        f"{len(qs)} registered queries; "
        f"{sum(1 for q in qs.values() if q.oracle)} with DuckDB oracle twins, "
        f"{sum(1 for q in qs.values() if not q.oracle)} rows-only "
        "(non-SQL-expressible: streaming state, sketches, Python-boundary).",
        "",
        "Regenerate with `python scripts/gen_operator_docs.py`.",
        "",
    ]
    for key in sorted(qs):
        q = qs[key]
        check = "oracle" if q.oracle else "rows-only"
        lines.append(f"## `{key}`  _({check})_")
        lines.append("")
        doc = " ".join(textwrap.dedent(q.doc or "").split())
        lines.append(doc)
        if q.scale_notes:
            notes = " ".join(textwrap.dedent(q.scale_notes).split())
            lines.append("")
            lines.append(f"**At 100 TB:** {notes}")
        lines.append("")
    return "\n".join(lines)


def out_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "OPERATORS.md")


def main() -> None:
    rendered = render()
    with open(out_path(), "w") as f:
        f.write(rendered)
    print(f"wrote {out_path()}")


def check() -> int:
    """Exit 1 when docs/OPERATORS.md is stale vs the live registry —
    the doc-drift gate (VERDICT r4 #6), run by tests/test_units.py."""
    try:
        with open(out_path()) as f:
            current = f.read()
    except OSError:
        current = ""
    if current != render():
        print("docs/OPERATORS.md is stale — rerun scripts/gen_operator_docs.py")
        return 1
    print("docs/OPERATORS.md up to date")
    return 0


def survey_key_section() -> str:
    """SURVEY.md §2.13: the complete key inventory grouped by module.
    Re-run with --survey-keys and splice the output over the existing
    section when keys are added (test_survey_lists_every_key enforces
    sync)."""
    import inspect
    from collections import defaultdict

    qs = all_queries()
    groups: dict[str, list[str]] = defaultdict(list)
    for k, q in qs.items():
        mod = inspect.getmodule(inspect.unwrap(q.spark)).__name__.split(".")[-1]
        groups[mod].append(k)
    lines = []
    for mod in sorted(groups):
        keys = " ".join(f"`{k}`" for k in sorted(groups[mod]))
        lines.append(f"- **{mod}** ({len(groups[mod])}): {keys}")
    return "\n".join(lines)


if __name__ == "__main__":
    if "--survey-keys" in sys.argv:
        print(survey_key_section())
    elif "--check" in sys.argv:
        raise SystemExit(check())
    else:
        main()
