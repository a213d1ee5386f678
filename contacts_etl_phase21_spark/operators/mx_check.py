"""E11: optional post-merge email deliverability re-validation.

Parity target: _apply_post_merge_email_mx_check
(reference combine_contacts.py:548-582) — re-validate every non-invalid
email with DNS deliverability, relabel failures 'invalid', then dedupe
case-insensitively preferring the valid copy.

Spark shape: the check runs inside an Arrow-batched pandas UDF, so DNS
I/O happens executor-side with per-batch amortization, never on the
driver. Network access and the `email_validator` package are both
optional in this container, so the checker is injectable: the default
uses email_validator with check_deliverability=True when importable,
else falls back to the regex tier (no network), and tests inject a
deterministic fake. Off by default (config email_dns_mx_check,
reference config.yaml:11) and excluded from benchmarks.

At scale: one mapInPandas pass over contacts — no shuffle. Rate-limit
caveat from the reference applies: a 1000-executor fleet doing
simultaneous DNS lookups needs a resolver cache or a per-partition
throttle; batching per Arrow chunk gives the hook for both.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.functions.emails import clean_email


def default_checker(value: str) -> bool:
    """True iff the address is deliverable (or at least well-formed when
    no deliverability backend is available)."""
    return bool(clean_email(value, check_deliverability=True))


def apply_mx_check(contacts: DataFrame,
                   checker: Callable[[str], bool] | None = None) -> DataFrame:
    """Relabel emails that fail the deliverability check as 'invalid',
    then dedupe case-insensitively keeping the valid copy first.

    Schema-preserving mapInPandas over the consolidated contacts."""
    check = checker or default_checker
    schema = contacts.schema
    names = [f.name for f in schema.fields]
    if "emails" not in names:
        raise ValueError("apply_mx_check needs an `emails` column")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, bool] = {}  # per-partition resolver cache

        def check_cached(value: str) -> bool:
            key = value.lower()
            if key not in cache:
                cache[key] = check(value)
            return cache[key]

        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict("records"):
                raw = row["emails"]  # numpy array — no `or []` truthiness
                emails = [dict(e) for e in raw] if raw is not None else []
                rechecked = []
                for e in emails:
                    label = e.get("label") or ""
                    if label != "invalid" and not check_cached(e["value"]):
                        e = {**e, "label": "invalid"}
                    rechecked.append(e)
                # case-insensitive dedupe, valid beats invalid, else first
                best: dict[str, dict] = {}
                order: list[str] = []
                for e in rechecked:
                    key = (e.get("value") or "").lower()
                    cur = best.get(key)
                    if cur is None:
                        best[key] = e
                        order.append(key)
                    elif cur.get("label") == "invalid" \
                            and e.get("label") != "invalid":
                        best[key] = e
                row["emails"] = [best[k] for k in order]
                out_rows.append(tuple(row.get(n) for n in names))
            yield pd.DataFrame(out_rows, columns=names)

    return contacts.mapInPandas(run, schema)
