"""Assemble CORRECTNESS_full.json from two oracle_check.py runs.

Usage: python scripts/assemble_correctness.py <sf001.json> <sf01.json> <commit>
"""
from __future__ import annotations

import json
import sys


def summarize(res: dict) -> dict:
    rows_only = sorted(n for n, r in res.items() if r.get("err") == "no_oracle")
    failures = sorted(
        n
        for n, r in res.items()
        if "rows_match" in r
        and not (r["rows_match"] and r["schema_match"] and r["hash_match"])
    )
    value_green = sum(
        1
        for r in res.values()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    )
    return {
        "total": len(res),
        "value_green": value_green,
        "rows_only": rows_only,
        "failures": failures,
    }


def main() -> None:
    sf001 = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2]))
    commit = sys.argv[3]
    out = {
        "generated": f"round 5, final code (commit {commit})",
        "tool": (
            "scripts/oracle_check.py (local replica of the driver gate: "
            "row count + sorted-schema + value hash vs DuckDB)"
        ),
        "summary": {"sf0.01": summarize(sf001), "sf0.1": summarize(sf01)},
        "sf0.01": sf001,
        "sf0.1": sf01,
    }
    with open("CORRECTNESS_full.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"], indent=1))


if __name__ == "__main__":
    main()
