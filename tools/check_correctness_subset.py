"""Oracle-check a NAMED SUBSET of registry queries (builder iteration
loop; the committed artifact still comes from check_correctness_full).

Usage:  python tools/check_correctness_subset.py q1 [q2 ...] [--sf DIR]

Same canonicalization contract as check_correctness_full (column sort,
row sort, value hash, pandas-twin hash) so a green here means green
there; prints per-query status and exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.check_correctness_full import _canon, _pandas_rows  # noqa: E402

from contacts_etl_phase21_spark.io import TABLES  # noqa: E402
from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or sorted(QUERIES)

    from contacts_etl_phase21_spark.session import get_spark
    spark = get_spark(app_name="check-correctness-subset")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in names:
        q = QUERIES[name]
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            if q.oracle is None:
                print(f"{name}: rows-only ({len(s_rows)} rows)")
                continue
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            s_names, s_hash = _canon(s_rows, s_cols)
            d_names, d_hash = _canon(d_rows, d_cols)
            _, sp_hash = _canon(_pandas_rows(sdf.toPandas()), s_cols)
            _, dp_hash = _canon(_pandas_rows(con.sql(q.oracle).df()),
                                d_cols)
            ok = (len(s_rows) == len(d_rows) and s_names == d_names
                  and s_hash == d_hash and sp_hash == dp_hash)
            if ok:
                print(f"{name}: ok ({len(s_rows)} rows)")
            else:
                failures += 1
                print(f"{name}: MISMATCH rows {len(s_rows)}/{len(d_rows)} "
                      f"schema {s_names == d_names} hash {s_hash == d_hash} "
                      f"pandas {sp_hash == dp_hash}")
                if s_names != d_names:
                    print(f"  spark cols:  {s_names}\n  oracle cols: {d_names}")
        except Exception:
            failures += 1
            print(f"{name}: ERROR\n{traceback.format_exc(limit=5)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
