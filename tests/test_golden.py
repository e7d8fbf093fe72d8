"""Golden-output pinning (SURVEY.md §5: "the 12 queries' results at fixed
seed, stored and hashed") — catches silent semantic drift the live DuckDB
differential can't see when both sides drift together (e.g. a cutoff-date
constant edit).  Regenerate deliberately with:

    python tests/test_golden.py regen
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_core.json")
SF = "/root/testdata/sf0.001"


def _result_hash(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    return len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def test_core_queries_match_golden(spark):
    from etl_cloud_logistics_spark.queries import REGISTRY, _load_all

    _load_all()
    golden = json.load(open(GOLDEN_PATH))
    mismatches = []
    for name, want in golden.items():
        n, h = _result_hash(REGISTRY[name].fn(spark, SF))
        if n != want["n_rows"] or h != want["hash"]:
            mismatches.append(f"{name}: rows {n} vs {want['n_rows']}, hash {h} vs {want['hash']}")
    assert not mismatches, "golden drift:\n" + "\n".join(mismatches)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "regen":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_cloud_logistics_spark.queries import REGISTRY, _load_all
    from etl_cloud_logistics_spark.session import get_spark

    _load_all()
    spark = get_spark("golden-regen")
    out = {}
    for name in sorted(n for n in REGISTRY if n.startswith("q")):
        n, h = _result_hash(REGISTRY[name].fn(spark, SF))
        out[name] = {"n_rows": n, "hash": h}
    json.dump(out, open(GOLDEN_PATH, "w"), indent=1)
    print(f"wrote {len(out)} golden entries to {GOLDEN_PATH}")
