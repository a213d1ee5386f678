"""Distributed BPE tokenizer training — the vocabulary-INDUCTION half
of the text-analysis story (ta_vocab_topk selects whole words,
ta_encode_tokens applies a given vocab; this module LEARNS a subword
vocab from the corpus).

Scale shape (the one real tokenizer trainers use — HF tokenizers /
SentencePiece train on a word-frequency table, never on the raw
corpus): ONE distributed pass aggregates the corpus to (word, count)
— map-side combined, output bounded by vocabulary size, optionally
capped at the top-V words — then the byte-pair merge loop runs
driver-side on that bounded table (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units": algorithm 1
operates on the word-frequency dict). At 100 TB the corpus is
scanned exactly once; the iterative part never touches it again.

The merge loop itself maintains pair counts INCREMENTALLY (only words
containing the just-merged pair are rewritten and only their pair
deltas applied), the standard trainer optimization — n_merges
iterations cost O(affected words), not O(vocab) each.

Determinism: word selection ties break by (count DESC, word ASC);
merge ties break by (count DESC, pair lexicographically ASC). The
whole merge sequence is a pure function of the word-frequency table,
so a re-run (or another engine's trainer fed the same table) produces
the identical vocabulary. The first-pass pair statistics are fully
relational and DuckDB-oracle-checked (ta_bpe_pair_counts); the merge
LOOP is genuinely iterative (each merge rewrites the symbol sequences
the next iteration counts), the registry's documented rows-only
class, and is pinned by a pure-python reference twin in tests.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def word_frequencies(df: DataFrame, text_col: str = "text",
                     top_v: int | None = None) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-scale pass.
    map-side combine shrinks each task's output to its distinct words;
    the shuffle moves |vocab| rows, not |corpus|. top_v caps the table
    deterministically by (cnt DESC, word ASC) — TakeOrdered on the
    already-aggregated frame, no second corpus scan."""
    wf = (df.select(F.explode(F.split(F.trim(F.col(text_col)), " "))
                    .alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if top_v is not None:
        wf = wf.orderBy(F.desc("cnt"), "word").limit(top_v)
    return wf


def char_pair_counts(words: DataFrame) -> DataFrame:
    """Iteration-0 BPE pair statistics, fully relational: adjacent
    CHARACTER pairs weighted by word frequency. explode(sequence) +
    substr are pure scan-side projections over the (tiny) word table;
    words of length 1 are filtered BEFORE the explode because Spark's
    sequence(1, 0) counts DOWN ([1, 0]) rather than yielding an empty
    array. Column names lft/rgt avoid the LEFT/RIGHT reserved words."""
    return (words.filter(F.length("word") >= 2)
            .withColumn("i", F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)))
            .select(F.col("word").substr(F.col("i"), F.lit(1)).alias("lft"),
                    F.col("word").substr(F.col("i") + 1, F.lit(1))
                    .alias("rgt"),
                    "cnt")
            .groupBy("lft", "rgt")
            .agg(F.sum("cnt").cast("bigint").alias("pair_count")))


def bpe_merges_local(word_counts: list[tuple[str, int]],
                     n_merges: int) -> list[tuple[int, str, str, str, int]]:
    """The driver-side merge loop over a bounded word-frequency table:
    (rank, left, right, merged, pair_count) per learned merge. Pure
    function — no RNG, ties broken by (count DESC, pair ASC). Stops
    early when no adjacent pair remains (every word fused to one
    symbol)."""
    words: list[list[str]] = [list(w) for w, _ in word_counts]
    freqs: list[int] = [c for _, c in word_counts]

    pair_counts: Counter[tuple[str, str]] = Counter()
    where: dict[tuple[str, str], set[int]] = {}

    def add_word(idx: int, sign: int) -> None:
        syms = words[idx]
        f = freqs[idx] * sign
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            if sign > 0:
                where.setdefault((a, b), set()).add(idx)

    for i in range(len(words)):
        add_word(i, +1)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        live = {p: c for p, c in pair_counts.items() if c > 0}
        if not live:
            break
        best_count = max(live.values())
        left, right = min(p for p, c in live.items() if c == best_count)
        merged = left + right
        merges.append((rank, left, right, merged, best_count))
        # Rewrite only the words that contain the pair; recount their
        # pair membership by full remove/re-add (delta application).
        affected = sorted(where.get((left, right), ()))
        for idx in affected:
            syms = words[idx]
            add_word(idx, -1)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            add_word(idx, +1)
        pair_counts[(left, right)] = 0
    return merges


def bpe_encode_expr(word, merges: list[tuple[int, str, str, str, int]]):
    """BPE-encode a word column with a LEARNED merge list as a pure
    column expression (r08 — the apply half of the trainer; no UDF):

    1. wrap every character in paired markers (\\x01c\\x02) with ONE
       regexp_replace — '(?s)(.)' → '\\x01$1\\x02';
    2. apply each merge in rank order as a literal replace of
       '\\x01l\\x02\\x01r\\x02' with '\\x01lr\\x02' — string replace
       scans left-to-right, skips overlaps, and resumes AFTER each
       replacement, which is exactly BPE's greedy merge pass, and the
       paired markers make cross-symbol false matches impossible
       (the same encoding the DuckDB certificate oracle uses, so the
       two engines execute the identical algorithm);
    3. strip the outer markers and split on '\\x02\\x01'.

    n_merges chained replaces stay inside whole-stage codegen (each is
    a small expression — not the one-giant-expression janino trap).
    Assumes words contain no \\x01/\\x02 bytes (whitespace-split text
    never does). Returns an array<string> of subword tokens."""
    o, c = "\x01", "\x02"
    enc = F.regexp_replace(word, r"(?s)(.)", o + "$1" + c)
    for _rank, lft, rgt, merged, _cnt in merges:
        enc = F.replace(enc, F.lit(o + lft + c + o + rgt + c),
                        F.lit(o + merged + c))
    inner = enc.substr(F.lit(2), F.length(enc) - 2)
    return F.split(inner, c + o)


def encode_words(words: DataFrame,
                 merges: list[tuple[int, str, str, str, int]]) -> DataFrame:
    """(word, cnt) → (word, cnt, n_tokens, tokens): apply a learned
    merge list to a word-frequency table (see bpe_encode_expr).
    Tokens join with '|' so the output stays scalar (the registry's
    no-array-cells rule)."""
    toks = bpe_encode_expr(F.col("word"), merges)
    return words.select(
        "word", "cnt",
        F.size(toks).cast("int").alias("n_tokens"),
        F.array_join(toks, "|").alias("tokens"))


def train_bpe_merges(spark: SparkSession, df: DataFrame,
                     text_col: str = "text", n_merges: int = 50,
                     top_v: int | None = 50_000) -> DataFrame:
    """End-to-end trainer: one corpus-scale word-frequency pass, Arrow
    transfer of the bounded table (toPandas, not py4j collect — the
    r06 lesson: collecting 5·10⁴ rows via py4j costs ~10s, Arrow <1s),
    local merge loop, merges back as a tiny DataFrame."""
    wf = word_frequencies(df, text_col, top_v).toPandas()
    wf = wf.sort_values(["cnt", "word"], ascending=[False, True])
    merges = bpe_merges_local(
        list(zip(wf["word"].tolist(), wf["cnt"].tolist())), n_merges)
    return spark.createDataFrame(
        merges,
        "merge_rank INT, lft STRING, rgt STRING, merged STRING, "
        "pair_count BIGINT")
