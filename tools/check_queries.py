"""Spot-check named queries against their DuckDB oracles at sf0.01.

Same canonicalization contract as tools/check_correctness_full.py, but
only for the query names given on the command line — the fast loop when
adding a new operator.

Usage:  python tools/check_queries.py name [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from contacts_etl_phase21_spark.io import TABLES  # noqa: E402
from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from tools.check_correctness_full import _canon  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

    from contacts_etl_phase21_spark.session import get_spark
    spark = get_spark(app_name="check-queries")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    rc = 0
    for name in names:
        q = QUERIES[name]
        sdf = q.fn(spark, sf_dir)
        s_rows = [tuple(r) for r in sdf.collect()]
        if q.oracle is None:
            print(f"{name}: rows-only ({len(s_rows)} rows)")
            continue
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
        s_names, s_hash = _canon(s_rows, list(sdf.columns))
        d_names, d_hash = _canon(d_rows, d_cols)
        ok = (len(s_rows) == len(d_rows) and s_names == d_names
              and s_hash == d_hash)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"spark={len(s_rows)} oracle={len(d_rows)} "
              f"cols {'=' if s_names == d_names else s_names} "
              f"{'' if s_names == d_names else d_names}")
        if not ok:
            rc = 1
            _key = lambda r: tuple(map(str, r))  # noqa: E731 — NULL/mixed-type safe
            for i, (a, b) in enumerate(zip(sorted(s_rows, key=_key),
                                           sorted(d_rows, key=_key))):
                if tuple(map(str, a)) != tuple(map(str, b)):
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
