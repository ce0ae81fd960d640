"""Generate QUERIES.md — the complete registry index (one row per named
query: oracle kind + first docstring line). Regenerate after adding
queries:

    python tools/gen_query_index.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> int:
    from multiagent_document_etl_system_spark.plans.registry import (
        NO_ORACLE_REASONS,
        QUERIES,
    )

    rows_only = [n for n, (_, sql) in QUERIES.items() if sql is None]
    missing = [n for n in rows_only if n not in NO_ORACLE_REASONS]
    assert not missing, f"rows-only queries without a stated reason: {missing}"
    lines = [
        "# Query registry index (generated — tools/gen_query_index.py)",
        "",
        f"{len(QUERIES)} named queries; `hash` = full DuckDB value-hash "
        "oracle, `rows` = rows-only BY CONSTRUCTION — each such query's "
        "reason (and where its pytest-level check lives) is stated in its "
        "row and machine-readable via "
        "`__spark_entry__.no_oracle_reasons()`.",
        "",
        "| # | query | check | what |",
        "|---|---|---|---|",
    ]
    for i, (name, (fn, sql)) in enumerate(QUERIES.items(), 1):
        doc = (fn.__doc__ or "").strip().split("\n")[0].strip()
        kind = ("hash" if sql is not None
                else f"rows — {NO_ORACLE_REASONS[name]}")
        lines.append(f"| {i} | `{name}` | {kind} | {doc} |")
    out = Path(REPO) / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(QUERIES)} queries, "
          f"{len(rows_only)} rows-only annotated)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
