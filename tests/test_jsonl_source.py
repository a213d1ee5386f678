"""JSONL corpus source: permissive parse, quarantine split, ring
composition (sources/jsonl_docs.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from contacts_etl_phase21_spark.sources.jsonl_docs import (
    DOC_SCHEMA, conform_docs, load_jsonl_documents,
)


def _write_fixture(tmp_path) -> str:
    lines = [
        '{"doc_id": 1, "text": "the quick brown fox", "lang": "en", '
        '"source": "web"}',
        '{"doc_id": 2, "text": "der schnelle fuchs", "lang": "de"}',
        '{"doc_id": 3, "text": "no metadata at all"}',
        '{"doc_id": 4, "text": "the quick brown fox", "lang":',  # truncated
        '{"doc_id": "five", "text": "type drift"}',              # id drift
        '{"doc_id": 6}',                                          # no text
        '{"doc_id": 7, "text": "   "}',                           # blank
        'utter garbage not json',
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_jsonl_parse_and_quarantine_split(spark, tmp_path):
    raw = load_jsonl_documents(spark, _write_fixture(tmp_path))
    assert raw.schema == DOC_SCHEMA
    clean, quarantined = conform_docs(raw)

    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    # defaults are data, not errors; derived n_chars is recomputed
    assert rows[2]["source"] == "unknown"
    assert rows[3]["lang"] == "und" and rows[3]["source"] == "unknown"
    assert rows[1]["n_chars"] == len("the quick brown fox")

    q = [(r["reason"], r["raw_line"]) for r in quarantined.collect()]
    reasons = sorted(r for r, _ in q)
    # truncated + type-drift + garbage are unparseable (drift
    # quarantines under the declared corrupt column); no-text and
    # blank-text are parsed but missing required fields
    assert reasons == ["missing_required", "missing_required",
                       "unparseable", "unparseable", "unparseable"]
    assert all(line for _, line in q), "audit trail must keep the line"
    # nothing dropped: clean + quarantined == input lines
    assert clean.count() + quarantined.count() == 8


def test_jsonl_composes_into_refresh_ring(spark, tmp_path):
    import json

    docs = [{"doc_id": i,
             "text": " ".join(
                 ["the", "of", "and", "quick", "brown"][j % 5]
                 for j in range(60)),
             "lang": "en", "source": "web"}
            for i in range(20)]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n",
                 encoding="utf-8")
    clean, _ = conform_docs(load_jsonl_documents(spark, str(p)))

    from contacts_etl_phase21_spark.operators import text_analysis as ta
    from contacts_etl_phase21_spark.operators.sampling import (
        token_budget_select,
    )

    g = ta.gopher_signals(F.col("text"))
    gated = clean.select("doc_id", "text", "n_chars",
                         g["g_words"].alias("gw")).filter("gw = 1")
    assert gated.count() == 20  # 60 words each
    sel = token_budget_select(gated, "doc_id", "n_chars",
                              ta.whitespace_token_count(F.col("text")),
                              budget=300)
    assert sel.count() == 5     # 60 tokens/doc, 300-token budget


def test_streaming_jsonl_ingest_incremental_drains(spark, tmp_path):
    """The 24/7 twin: drain 1 ingests the landed files; files landed
    AFTER drain 1 are picked up by drain 2 from the same checkpoint
    with no re-ingestion of drain-1 rows (file-source seen-files
    exactly-once)."""
    import json

    from contacts_etl_phase21_spark.streaming.jsonl_ingest import (
        run_jsonl_quarantine_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    (landing / "a.jsonl").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": f"doc {i} text",
                              "lang": "en", "source": "web"})
                  for i in range(5)) + "\nnot json at all\n",
        encoding="utf-8")
    run_jsonl_quarantine_ingest(spark, str(landing), clean_dir,
                                quar_dir, ckpt)
    c1 = spark.read.parquet(clean_dir)
    q1 = spark.read.parquet(quar_dir)
    assert c1.count() == 5 and q1.count() == 1
    assert q1.collect()[0]["reason"] == "unparseable"

    # land a second file, re-drain from the SAME checkpoint
    (landing / "b.jsonl").write_text(
        json.dumps({"doc_id": 100, "text": "late arrival"}) + "\n"
        + json.dumps({"doc_id": 101}) + "\n",
        encoding="utf-8")
    run_jsonl_quarantine_ingest(spark, str(landing), clean_dir,
                                quar_dir, ckpt)
    c2 = spark.read.parquet(clean_dir)
    q2 = spark.read.parquet(quar_dir)
    assert c2.count() == 6, "only the new file's clean row is added"
    assert q2.count() == 2
    got = {r["doc_id"] for r in c2.collect()}
    assert got == {0, 1, 2, 3, 4, 100}
    # batch and streaming parses agree: same clean schema
    from contacts_etl_phase21_spark.sources.jsonl_docs import (
        conform_docs, load_jsonl_documents,
    )
    batch_clean, _ = conform_docs(
        load_jsonl_documents(spark, str(landing / "a.jsonl")))
    # parquet roundtrip relaxes nullability flags; names+types must match
    assert ([(f.name, f.dataType) for f in batch_clean.schema.fields]
            == [(f.name, f.dataType) for f in c2.schema.fields])


def test_jsonl_landing_to_curate_one_streaming_query(spark, tmp_path):
    """End-to-end continuous ingest: landing-zone JSONL → conform →
    full curate pipeline (quality gate, row-local decontamination,
    fingerprint dedup, PII scrub, shard) as ONE streaming query — the
    rings compose without a staging hop. Quarantine-bound lines never
    reach the curate stages."""
    import json
    import uuid

    from contacts_etl_phase21_spark.operators.decontamination import (
        broadcast_eval_ngrams,
    )
    from contacts_etl_phase21_spark.sources.jsonl_docs import conform_docs
    from contacts_etl_phase21_spark.streaming.curate_ingest import (
        stream_curate_ingest,
    )
    from contacts_etl_phase21_spark.streaming.jsonl_ingest import (
        stream_jsonl_documents,
    )

    good = ("the quick brown fox jumps over a lazy dog and naps of "
            "an afternoon")
    dup = " ".join(reversed(good.split()))   # same fingerprint
    landing = tmp_path / "landing"
    landing.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": good, "lang": "en"}),
        json.dumps({"doc_id": 2, "text": dup, "lang": "en"}),   # deduped
        json.dumps({"doc_id": 3, "text": "too short", "lang": "en"}),
        'broken { json',                                         # quarantine
    ]
    (landing / "a.jsonl").write_text("\n".join(lines) + "\n",
                                     encoding="utf-8")

    eval_docs = spark.createDataFrame(
        [(0, "zz yy xx ww vv uu tt ss rr qq pp oo")],
        ["doc_id", "text"])
    eval_bc = broadcast_eval_ngrams(eval_docs, "doc_id", "text", n=8)

    stream = stream_jsonl_documents(spark, str(landing))
    clean, _ = conform_docs(stream)
    curated = stream_curate_ingest(
        clean.select("doc_id", "text", "lang"), eval_bc)
    assert curated.isStreaming

    name = f"jsonlcurate_{uuid.uuid4().hex[:8]}"
    q = (curated.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql(f"SELECT doc_id FROM {name}").collect()
    # doc 1 survives; 2 is a fingerprint dup; 3 fails quality; the
    # broken line was quarantined before the pipeline
    assert {r["doc_id"] for r in rows} == {1}
