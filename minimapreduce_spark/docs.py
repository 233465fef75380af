"""Generate QUERIES.md — the full query catalog — from the registry.

Usage: python -m minimapreduce_spark.docs [out_md]

One row per registered query: module, oracle kind, bench flag, and the
first line of its docstring. COVERAGE.md maps SURVEY §2 → queries; this
is the reverse index (query → what it does), regenerated so it can
never drift from the code.
"""

from __future__ import annotations

import sys
from collections import defaultdict


def main(out_path: str) -> None:
    from minimapreduce_spark import queries as q

    by_module: dict[str, list] = defaultdict(list)
    for name in sorted(q.REGISTRY):
        entry = q.REGISTRY[name]
        mod = entry.fn.__module__.replace("minimapreduce_spark.", "")
        first_line = " ".join((entry.doc or "").split("\n\n")[0].split())
        if len(first_line) > 160:
            first_line = first_line[:157] + "..."
        by_module[mod].append((name, entry, first_line))

    n_total = len(q.REGISTRY)
    n_oracle = sum(1 for e in q.REGISTRY.values() if e.oracle is not None)
    n_bench = sum(1 for e in q.REGISTRY.values() if e.bench)
    lines = [
        "# QUERIES — the registered surface, generated from the registry",
        "",
        f"{n_total} queries; {n_oracle} DuckDB-oracle-checked, "
        f"{n_total - n_oracle} rows-only; {n_bench} benchmarked in bench.py.",
        "Regenerate with `python -m minimapreduce_spark.docs` — never edit by hand.",
        "",
    ]
    for mod in sorted(by_module):
        lines += [f"## {mod}", "", "| query | check | bench | what it does |", "|---|---|---|---|"]
        for name, entry, doc in by_module[mod]:
            check = "oracle" if entry.oracle is not None else "rows-only"
            bench = "✓" if entry.bench else ""
            lines.append(f"| `{name}` | {check} | {bench} | {doc} |")
        lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {n_total} queries, {len(by_module)} modules")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "QUERIES.md")
