"""Production-merge-count BPE probe (BASELINE.md protocol, r09).

The trainer/encoder were proven correct at n_merges=30; real
tokenizers run ~32k merges over ~10^6-word vocabularies. This probe
measures both halves at that scale on a SYNTHETIC word-frequency
table (deterministic seed; letters drawn with English-ish frequencies
so pair statistics have realistic skew; counts Zipfian):

    train    bpe_merges_local at n_merges in {1k, 4k, 32k} over a
             10^6-word vocab — the incremental pair-count loop's
             cost curve (the corpus pass is NOT in scope here: word
             frequencies cost one aggregation regardless of merges)
    encode   encode_words_production (broadcast candidate-heap
             mapInPandas) segmenting all 10^6 words with the full
             32k-merge list on local[32] — the tier that exists
             because 32k chained replaces cannot codegen
    sanity   the expression tier is NOT run at 32k (that is the
             point); at 200 merges both tiers run and must agree,
             timed for the crossover narrative

Usage: python tools/bench_bpe.py [n_words]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402

# English-ish letter weights (public single-letter frequency table,
# rounded): enough skew to make pair statistics realistic.
_LETTERS = "etaoinshrdlcumwfgypbvkjxqz"
_WEIGHTS = [12.7, 9.1, 8.2, 7.5, 7.0, 6.7, 6.3, 6.1, 6.0, 4.3, 4.0,
            2.8, 2.8, 2.4, 2.4, 2.2, 2.0, 2.0, 1.9, 1.5, 1.0, 0.8,
            0.2, 0.2, 0.1, 0.1]


def synth_word_counts(n_words: int, seed: int = 7
                      ) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    seen: set[str] = set()
    out: list[tuple[str, int]] = []
    rank = 0
    while len(out) < n_words:
        ln = rng.randint(3, 12)
        w = "".join(rng.choices(_LETTERS, weights=_WEIGHTS, k=ln))
        if w in seen:
            continue
        seen.add(w)
        rank += 1
        out.append((w, max(1, int(2_000_000 / rank ** 1.05))))
    return out


def main() -> int:
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        bpe_merges_local, encode_words, encode_words_production,
    )
    from contacts_etl_phase21_spark.session import get_spark

    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    report: dict = {"bench": "bpe_production_scale", "n_words": n_words,
                    "load_1m": os.getloadavg()[0]}

    t0 = time.time()
    wc = synth_word_counts(n_words)
    report["synth_sec"] = round(time.time() - t0, 2)

    # train curve — each count from scratch so the points are
    # independent measurements, not a shared prefix
    merges_32k = None
    for n_merges in (1_000, 4_000, 32_000):
        t0 = time.time()
        m = bpe_merges_local(wc, n_merges)
        dt = round(time.time() - t0, 2)
        report[f"train_{n_merges}_sec"] = dt
        report[f"train_{n_merges}_learned"] = len(m)
        print(f"train n_merges={n_merges}: {dt}s ({len(m)} learned)",
              file=sys.stderr)
        if n_merges == 32_000:
            merges_32k = m

    spark = get_spark()
    words_df = spark.createDataFrame(wc, "word STRING, cnt BIGINT") \
        .repartition(32).persist()
    words_df.count()

    # encode: full vocab through the production tier at 32k merges
    t0 = time.time()
    enc = encode_words_production(words_df, merges_32k)
    total_tokens = enc.agg(F.sum("n_tokens")).collect()[0][0]
    report["encode_32k_sec"] = round(time.time() - t0, 2)
    report["encode_32k_total_tokens"] = int(total_tokens)
    print(f"encode 32k merges x {n_words} words: "
          f"{report['encode_32k_sec']}s, {total_tokens} tokens",
          file=sys.stderr)

    # crossover sanity at 200 merges: tiers agree; both timed
    m200 = merges_32k[:200]
    t0 = time.time()
    prod200 = encode_words_production(words_df, m200) \
        .agg(F.sum("n_tokens"), F.sum(F.crc32("tokens"))).collect()[0]
    report["encode_prod_200_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    expr200 = encode_words(words_df, m200) \
        .agg(F.sum("n_tokens"), F.sum(F.crc32("tokens"))).collect()[0]
    report["encode_expr_200_sec"] = round(time.time() - t0, 2)
    assert tuple(prod200) == tuple(expr200), (prod200, expr200)
    report["tiers_agree_200"] = True
    print(f"200-merge crossover: prod {report['encode_prod_200_sec']}s "
          f"vs expr {report['encode_expr_200_sec']}s (equal outputs)",
          file=sys.stderr)

    words_df.unpersist()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
