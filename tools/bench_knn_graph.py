"""Self-KNN-graph scale probe (r09 s2).

The registered ann_knn_graph_blocked proves the IVF-blocked self-KNN
plan at full probe against the exact oracle; this probe answers the
questions that matter when the graph is built over a real store:

1. Wall-clock of the blocked build at 10⁵ (and optionally 10⁶)
   clustered vectors, where the exact all-pairs tier (10¹⁰ / 10¹²
   cosine evals) is already uncomputable — the whole point of
   blocking. BOTH physical tiers are timed: the relational cell
   equi-join (knn_graph_ivf — every candidate pair crosses the
   interpreted zip_with cosine) and the per-cell blocked-GEMM kernel
   (knn_graph_ivf_blas — candidates scored inside BLAS, only
   ~n × n_probe × k rows reach the final window). The relational
   tier is measured at n_probe=2 only — its cost is candidate-pair
   count, and one point establishes the gap.
2. Recall vs EXACT ground truth at n_probe ∈ {2, 4, 8} of 64 cells,
   measured on a 200-query sample (brute_force_topk with exclude_self
   against the FULL corpus — 200 × n pairs is computable at any n
   here, so the ground truth is exact for the sampled queries even
   when the full exact graph is not).
3. The n_probe scan-fraction → recall curve an operator sets the knob
   by (same contract as the max_bucket and IVF-PQ probe tables in
   BASELINE.md).

Geometry: clustered_embeddings at sigma 0.35 (the ANN probes'
setting) — within-cluster cosine ≈ 0.89 vs ~0 across, so true
neighbors are overwhelmingly intra-cluster and recall measures how
well kmeans cells recover the latent clusters.

4. (r10) The SOAR-style spill knob: recall at the same probe with
   boundary vectors double-assigned (spill_margin), plus the measured
   spill fraction (extra member rows) so scan cost is reported as
   (probe/cells)·(1+spill_frac), not just probe/cells. This is the
   answer to the r09 finding that fixed-probe recall decays as cells
   grow (0.511 @ 2/256 at 10⁶).

Usage: python tools/bench_knn_graph.py [N[:n_cells] ...]
(default: 1e5:64 — cells should scale ~√n / with n: pair work is
n_probe·n²/n_cells, so a fixed cell count quadratically penalizes
larger corpora). The relational tier is timed only at the default
64-cell 10⁵ config (REL_TIER=1 opts in elsewhere).
PROBES / SPILLS env override the swept values
(default PROBES=2,4,8 SPILLS=0.05).
One JSON line per argument.

r11 legs:
- RESTRICT=1: pass query_ids=<the 200 sampled queries> to every blas
  build, so RECALL is measured without paying the full-graph build
  (at 10⁶ the full build is ~13 min/point; restricted is the
  assignment pass + 200 queries' cells). wall_s is then the
  restricted wall, NOT a full-build wall — flagged in the JSON.
- SPILL_TARGETS=0.4[,..]: the adaptive margin (suggest_spill_margin)
  — per target, record the picked τ + sampled frac and sweep the
  probes with that margin (judge r10 #2's re-measurement).
- HARDNEG=1 now also records the LABELED suggest_probe estimate
  (judge r10 #1): est_curve values at each measured probe plus the
  probe the estimator would pick for 0.9 — the
  estimator-vs-measured check is |est − measured| at equal probe.
  HN_PROBES overrides the hard-neg probe sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402

from contacts_etl_phase21_spark.operators import (  # noqa: E402
    similarity_search as ann,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402
from tools.bench_corpus import clustered_embeddings  # noqa: E402

K = 5
N_CELLS = 64
N_QUERIES = 200


def _measure(graph, sample_ids, truth):
    """Materialize the full graph once (persist → count), read the
    sampled queries' edges off the materialized frame, unpersist."""
    graph = graph.persist()
    try:
        t0 = time.time()
        n_edges = graph.count()
        wall = round(time.time() - t0, 1)
        got = {(r["query_id"], r["vec_id"])
               for r in graph.filter(
                   F.col("query_id").isin(list(sample_ids))).collect()}
        return {"wall_s": wall, "edges": n_edges,
                "recall": round(len(truth & got) / len(truth), 3)}
    finally:
        graph.unpersist()


def main() -> None:
    specs = []
    for a in sys.argv[1:] or ["1e5:64"]:
        n_s, _, c_s = a.partition(":")
        specs.append((int(float(n_s)), int(c_s) if c_s else N_CELLS))
    spark = get_spark(app_name="bench-knn-graph")
    for n, n_cells in specs:
        emb = clustered_embeddings(spark, n).select("vec_id", "embedding") \
            .persist()
        emb.count()

        # exact ground truth on a deterministic query sample
        step = max(1, n // N_QUERIES)
        sample = emb.filter(F.col("vec_id") % step == 1) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        truth = {(r["query_id"], r["vec_id"])
                 for r in ann.brute_force_topk(
                     emb, sample, K, exclude_self=True).collect()}
        sample_ids = {q for q, _ in truth}

        out = {"n": n, "k": K, "n_cells": n_cells,
               "n_queries": len(sample_ids)}
        probes = [int(p) for p in
                  os.environ.get("PROBES", "2,4,8").split(",")]
        spills = [float(s) for s in
                  os.environ.get("SPILLS", "0.05").split(",") if s]

        # spill fraction per margin, measured on a 10k-vector sample
        # with the kernel's exact margin rule (sim to 1st − 2nd
        # centroid < τ) — sizes the index inflation / scan premium
        import numpy as np
        cents = ann._quantizer_rows(emb, n_cells, "vec_id",
                                    "embedding", "kmeans_local", None)
        cmat = np.array([v for _, v in cents], dtype=np.float64)
        samp = np.stack([
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.filter(F.col("vec_id") % max(1, n // 10_000)
                                == 0).collect()])
        sim = (samp @ cmat.T) / np.outer(
            np.sqrt((samp * samp).sum(1)),
            np.sqrt((cmat * cmat).sum(1)))
        top2 = -np.sort(-sim, axis=1)[:, :2]
        margins = top2[:, 0] - top2[:, 1]
        spill_frac = {s: round(float((margins < s).mean()), 4)
                      for s in spills}
        out["spill_frac"] = spill_frac
        restrict = os.environ.get("RESTRICT") == "1"
        qids = sorted(sample_ids) if restrict else None
        out["restricted_walls"] = restrict

        for n_probe in probes:
            r = _measure(ann.knn_graph_ivf_blas(
                emb, K, n_cells, n_probe, quantizer="kmeans_local",
                cent_rows=cents, query_ids=qids), sample_ids, truth)
            r["scan_frac"] = round(n_probe / n_cells, 3)
            out[f"blas_probe{n_probe}"] = r
            for s in spills:
                rs = _measure(ann.knn_graph_ivf_blas(
                    emb, K, n_cells, n_probe,
                    quantizer="kmeans_local", cent_rows=cents,
                    spill_margin=s, query_ids=qids), sample_ids, truth)
                rs["scan_frac"] = round(
                    n_probe / n_cells * (1 + spill_frac[s]), 3)
                out[f"blas_probe{n_probe}_spill{s}"] = rs

        # r11 (judge r10 #2): the adaptive margin — τ picked as the
        # target quantile of the measured margin distribution, then
        # the same probe sweep at that margin
        for t in [float(x) for x in
                  os.environ.get("SPILL_TARGETS", "").split(",") if x]:
            tau = ann.suggest_spill_margin(emb, cents, t)
            t_frac = round(float((margins < tau).mean()), 4)
            out[f"spill_target{t}"] = {"tau": round(tau, 4),
                                       "sampled_frac": t_frac}
            for n_probe in probes:
                rs = _measure(ann.knn_graph_ivf_blas(
                    emb, K, n_cells, n_probe,
                    quantizer="kmeans_local", cent_rows=cents,
                    spill_margin=tau, query_ids=qids),
                    sample_ids, truth)
                rs["scan_frac"] = round(
                    n_probe / n_cells * (1 + t_frac), 3)
                out[f"blas_probe{n_probe}_starget{t}"] = rs
        if os.environ.get("REL_TIER") == "1":
            out["rel_probe2"] = _measure(ann.knn_graph_ivf(
                emb, K, n_cells, 2, quantizer="kmeans_local"),
                sample_ids, truth)

        # r10 s2: hard-negative mining at kernel tier — recall of the
        # top-K highest-cosine DIFFERENT-label (= different latent
        # cluster here) vectors vs numpy ground truth on the sampled
        # queries. Cross-cluster neighbors are boundary points, so
        # this stresses exactly the cells partial probe skips.
        if os.environ.get("HARDNEG") == "1":
            lab = clustered_embeddings(spark, n) \
                .select("vec_id", "embedding", "label").persist()
            lab.count()
            pdf = lab.toPandas()
            ids_np = pdf["vec_id"].to_numpy()
            lbl_np = pdf["label"].to_numpy()
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]])
            nrm = np.sqrt((mat * mat).sum(1))
            pos = {int(v): i for i, v in enumerate(ids_np)}
            qrows = np.array([pos[q] for q in sorted(sample_ids)])
            simq = (mat[qrows] @ mat.T) / np.outer(nrm[qrows], nrm)
            hn_truth = set()
            for r, qi in enumerate(qrows):
                mask = lbl_np != lbl_np[qi]
                cand = np.where(mask)[0]
                srt = cand[np.argsort(-simq[r, cand], kind="stable")[:K]]
                hn_truth.update(
                    (int(ids_np[qi]), int(ids_np[c])) for c in srt)
            # r11 (judge r10 #1): the LABELED estimator next to every
            # measured point — |est − measured| at equal probe is the
            # estimator-quality check (suggest_probe standard: ~5 pts)
            hn_est, hn_curve = ann.suggest_probe(
                lab, cents, target_recall=0.9, k=K, n_sample=1000,
                label_col="label")
            out["hardneg_est_probe90"] = hn_est
            hn_probes = [int(p) for p in os.environ.get(
                "HN_PROBES", os.environ.get("PROBES", "2,4,8")
            ).split(",")]
            for n_probe in hn_probes:
                g = ann.knn_graph_ivf_blas(
                    lab, K, n_cells, n_probe,
                    quantizer="kmeans_local", cent_rows=cents,
                    exclude_label="label",
                    query_ids=sorted(sample_ids)).persist()
                t0 = time.time()
                g.count()
                got = {(r["query_id"], r["vec_id"])
                       for r in g.collect()}
                out[f"hardneg_probe{n_probe}"] = {
                    "wall_s": round(time.time() - t0, 1),
                    "recall": round(
                        len(hn_truth & got) / len(hn_truth), 3),
                    "est_recall": round(hn_curve[n_probe - 1], 3)}
                g.unpersist()
            lab.unpersist()
        emb.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
