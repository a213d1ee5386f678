"""Full-registry correctness self-check.

The external driver hash-checks only the first 50 entries of
``__spark_entry__.queries()``; rotation of the window can leave queries
unverified for a round (round 3 dropped the whole ER family). This tool
closes that gap: it runs EVERY registered query on Spark AND its DuckDB
oracle at sf0.01, compares row counts / column sets / value hashes with
the same canonicalization contract as the driver (pandas sort over all
columns — so non-scalar cells fail here exactly as they would there),
and writes ``CORRECTNESS_FULL_r{N}.json`` in the driver's row format.

Usage:  python tools/check_correctness_full.py [round_no] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import traceback

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from contacts_etl_phase21_spark.io import TABLES  # noqa: E402
from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    return str(v)


def _pandas_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Rows as the driver sees them: THROUGH a pandas conversion.

    DuckDB's .df() and Spark's .toPandas() both change cell renderings
    relative to fetchall()/collect() — most critically DuckDB HUGEINT
    -> float64 ("123.0" vs "123"), the root cause of the r04-r06
    ta_corpus_stats driver hash-red. Hashing this path beside the
    fetchall path makes the committed artifact driver-faithful."""
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def _canon(rows: list[tuple], cols: list[str]) -> tuple[list[str], str]:
    """Driver-contract canonicalization: sort columns by name, sort rows,
    hash the stringified cells. The pandas sort_values probe reproduces
    the driver's failure on unhashable (non-scalar) cells."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # Probe: the driver canonicalizes via pandas sort; a query emitting
    # list/struct cells must error HERE, not silently pass a laxer check.
    pdf = pd.DataFrame(rows, columns=cols)
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns), inplace=False, kind="mergesort")
    norm = sorted(
        tuple(_canon_value(row[i]) for i in idx) for row in rows)
    h = hashlib.md5(
        "\n".join("\x1f".join(r) for r in norm).encode()).hexdigest()
    return [cols[i] for i in idx], h


def main() -> int:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "04"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = os.path.join(_REPO, f"CORRECTNESS_FULL_r{round_no}.json")

    from contacts_etl_phase21_spark.session import get_spark
    spark = get_spark(app_name="check-correctness-full")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    report: dict[str, dict] = {}
    failures = 0
    for name, q in QUERIES.items():
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            row["spark_rows"] = len(s_rows)
            if q.oracle is None:
                row["err"] = "no_oracle"
            else:
                # r07 no-HUGEINT rule: the driver canonicalizes oracle
                # results through pandas, where DuckDB renders HUGEINT
                # (e.g. bare SUM(BIGINT)) as float64 ("123.0") while
                # fetchall() gives int ("123") — the exact mechanism of
                # the 3-round ta_corpus_stats hash-red. Flag any oracle
                # emitting a pandas-hostile type so it fails HERE.
                bad_types = [
                    f"{c}:{t}" for c, t in
                    zip(con.sql(q.oracle).columns, con.sql(q.oracle).types)
                    if str(t).startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))]
                if bad_types:
                    raise AssertionError(
                        f"pandas-hostile oracle column types {bad_types}; "
                        f"CAST to BIGINT (registry no-HUGEINT rule)")
                res = con.execute(q.oracle)
                d_cols = [d[0] for d in res.description]
                d_rows = [tuple(r) for r in res.fetchall()]
                row["oracle_rows"] = len(d_rows)
                s_names, s_hash = _canon(s_rows, s_cols)
                d_names, d_hash = _canon(d_rows, d_cols)
                row["rows_match"] = len(s_rows) == len(d_rows)
                row["schema_match"] = s_names == d_names
                row["hash_match"] = s_hash == d_hash
                # Driver-faithful twin check: both sides through pandas.
                _, sp_hash = _canon(_pandas_rows(sdf.toPandas()), s_cols)
                _, dp_hash = _canon(_pandas_rows(con.sql(q.oracle).df()),
                                    d_cols)
                row["pandas_hash_match"] = sp_hash == dp_hash
                if not (row["rows_match"] and row["schema_match"]
                        and row["hash_match"]
                        and row["pandas_hash_match"]):
                    failures += 1
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
            failures += 1
        status = ("ok" if row["hash_match"] and row.get("pandas_hash_match")
                  else "PANDAS-DIVERGENT" if row["hash_match"]
                  else row["err"] and row["err"].strip().splitlines()[-1])
        print(f"{name}: {status}", flush=True)
        report[name] = row

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    n_green = sum(1 for r in report.values() if r["hash_match"])
    n_pd = sum(1 for r in report.values() if r.get("pandas_hash_match"))
    n_rows_only = sum(1 for r in report.values() if r["err"] == "no_oracle")
    print(f"\n{n_green} hash-green ({n_pd} pandas-green) / {len(report)} "
          f"total ({n_rows_only} rows-only, {failures} failures) "
          f"-> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
