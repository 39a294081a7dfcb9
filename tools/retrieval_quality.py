"""Retrieval-quality audit for the lexical/hybrid tier — the RECALL.md
counterpart for the round-8 rankers.

ANN recall has exact ground truth (the BLAS scan); ranked lexical
retrieval does not, so this audits the properties that make the tier
worth shipping instead:

  * ranker DIVERSITY — top-10 Jaccard overlap between BM25 and
    query-likelihood (Dirichlet) on the shared fixed query workload.
    Low overlap is the reason rank fusion exists (Cormack et al. 2009
    fuses precisely because different rankers disagree on the tail).
  * fusion MIXING — for the hybrid RRF gate, the share of each fused
    top-10 contributed by the lexical-only / dense-only / both sources.
    A fusion that only echoes one side is a no-op; these numbers show
    RRF actually arbitrates.

Round 9 adds the missing third leg (VERDICT r8 stretch): known-item
RECALL against a planted relevance oracle. The synthetic corpus contains
genuine near-duplicate/quotation pairs by construction; verified n-gram
Jaccard ≥ τ (the dedup tier's own exact measure, LSH-candidated) defines
"relevant", each such document becomes a query-by-example query
(exclude_self), and recall@k per ranker — BM25, Dirichlet QL, JM QL,
TF-IDF cosine, dense cosine, and the BM25+dense RRF fusion — measures
whether each ranker FINDS a document's near-duplicates, the retrieval
task contamination checking actually runs.

Writes RETRIEVAL.md at the repo root and prints one JSON line.

Usage: python tools/retrieval_quality.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def recall_audit(spark, sf_dir: str, k: int = 10, tau: float = 0.3,
                 max_queries: int = 25):
    """recall@k per ranker against the verified-Jaccard relevance oracle.

    Relevance = exact shingle Jaccard ≥ tau over LSH candidates (the
    dedup tier's own measure — deterministic, corpus-derived, no labels
    needed). Queries: up to max_queries docs (lowest ids) that have ≥1
    relevant partner; query terms are the doc's distinct tokens
    (query-by-example, exclude_self). recall@k(q) =
    |top-k(q) ∩ relevant(q)| / min(k, |relevant(q)|), macro-averaged."""
    from pyspark.sql import functions as F

    from database_replicator_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from database_replicator_spark.operators.retrieval import (
        bm25_topk,
        doc_tokens,
        ql_dirichlet_topk,
        ql_jm_topk,
        rrf_fuse,
        term_stats,
        tfidf_cosine_topk,
    )
    from database_replicator_spark.operators.similarity import topk_blas
    from database_replicator_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sh = doc_shingles(docs)
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    pairs = (
        jaccard_pairs(sh, candidates=cands, threshold=tau)
        .select("doc1", "doc2")
        .collect()
    )
    rel: dict[int, set] = {}
    for r in pairs:
        rel.setdefault(r["doc1"], set()).add(r["doc2"])
        rel.setdefault(r["doc2"], set()).add(r["doc1"])
    qids = sorted(rel)[:max_queries]
    relevant = {q: rel[q] for q in qids}
    qdf = spark.createDataFrame([(int(i),) for i in qids], "doc_id long")
    qterms = (
        doc_tokens(docs.join(qdf, on="doc_id", how="left_semi"))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
        .localCheckpoint()
    )
    tf, dl = term_stats(docs)
    stats = (tf.localCheckpoint(), dl.localCheckpoint())
    kw = dict(k=k, prefilter_buckets=8, exclude_self=True, stats=stats)
    lex = bm25_topk(docs, qterms, **kw)
    dense = topk_blas(
        emb, emb.filter(F.col("vec_id").isin([int(i) for i in qids])), k=k
    ).select("query_id", F.col("corpus_id").alias("doc_id"), F.col("rank"))
    # positive control: rank by SHARED-SHINGLE COUNT (the signal family
    # the relevance oracle itself lives in, and the one the
    # decontamination tier actually uses) — near-verbatim pairs must top
    # this ranking or the whole protocol is miswired
    qsh = sh.join(
        qdf.withColumnRenamed("doc_id", "qid"),
        sh["doc_id"] == F.col("qid"),
    ).select(F.col("qid").alias("query_id"), "shingle").distinct()
    from pyspark.sql import Window

    wsh = Window.partitionBy("query_id").orderBy(
        F.col("n_shared").desc(), F.col("doc_id").asc()
    )
    ngram_rank = (
        sh.join(qsh, on="shingle")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
        .withColumn("rank", F.row_number().over(wsh))
        .filter(F.col("rank") <= k)
    )
    rankers = {
        "bm25": lex,
        "ql_dirichlet": ql_dirichlet_topk(docs, qterms, **kw),
        "ql_jm": ql_jm_topk(docs, qterms, **kw),
        "tfidf_cosine": tfidf_cosine_topk(docs, qterms, **kw),
        "dense_cosine": dense,
        "rrf_bm25_dense": rrf_fuse(
            lex.select("query_id", "doc_id", "rank"), dense, k=k
        ),
        "ngram_overlap_control": ngram_rank,
    }
    out = {}
    for name, df in rankers.items():
        tops: dict[int, set] = {}
        for r in df.select("query_id", "doc_id").collect():
            tops.setdefault(r["query_id"], set()).add(r["doc_id"])
        per_q = [
            len(tops.get(q, set()) & relevant[q]) / min(k, len(relevant[q]))
            for q in qids
        ]
        out[name] = round(sum(per_q) / len(per_q), 4) if per_q else 0.0
    return out, len(qids), sum(len(v) for v in relevant.values())


def maxsim_prefilter_audit(spark, sf_dir: str, k: int = 10,
                           cand_grid=(5, 10, 20, 50, 200)):
    """recall@k of PREFILTERED maxsim vs EXACT maxsim (r11 verdict ask:
    the `prefilter_candidates=20` cut was argued, never measured).

    Exact ground truth = late_interaction_topk(prefilter_candidates=
    None): every (query, doc) pair scored, no candidate cut — same
    scorer, so any divergence is PURELY candidate admission. Workload =
    the fixed gate queries (3 short keyword queries) plus query-by-
    example queries (distinct tokens of the 15 lowest-id docs — the
    long-query regime where the exact-match prefilter is most load-
    bearing). recall@k(q) = |top-k(cut) ∩ top-k(exact)| / k."""
    from pyspark.sql import functions as F

    from database_replicator_spark.operators.retrieval import (
        doc_tokens,
        late_interaction_topk,
    )
    from database_replicator_spark.oracle_sql_fragments import _BM25_QUERIES
    from database_replicator_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    qbe_ids = [r["doc_id"] for r in
               docs.select("doc_id").orderBy("doc_id").limit(15).collect()]
    qbe = (
        doc_tokens(docs.filter(F.col("doc_id").isin(qbe_ids)))
        .select((F.col("doc_id") + 1000).alias("query_id"),
                "term")
        .distinct()
    )
    fixed = spark.createDataFrame(_BM25_QUERIES, "query_id long, term string")
    queries = fixed.unionByName(qbe).localCheckpoint()

    def tops(df):
        out = {}
        for r in df.select("query_id", "doc_id").collect():
            out.setdefault(r["query_id"], set()).add(r["doc_id"])
        return out

    exact = tops(late_interaction_topk(docs, queries, k=k,
                                       prefilter_candidates=None))
    curve = {}
    for c in cand_grid:
        cut = tops(late_interaction_topk(docs, queries, k=k,
                                         prefilter_candidates=c))
        per_q = [len(cut.get(q, set()) & exact[q]) / k for q in exact]
        curve[c] = round(sum(per_q) / len(per_q), 4)
    return curve, len(exact)


def main() -> int:
    from database_replicator_spark import queries_r8 as q8
    from database_replicator_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("retrieval_quality")
    spark.sparkContext.setLogLevel("ERROR")

    def topk_sets(df, qcol="query_id", dcol="doc_id"):
        out = {}
        for r in df.collect():
            out.setdefault(r[qcol], set()).add(r[dcol])
        return out

    bm25 = topk_sets(q8.doc_bm25_topk(spark, sf_dir))
    ql = topk_sets(q8.doc_ql_dirichlet_topk(spark, sf_dir))
    overlaps = {}
    for q in sorted(bm25):
        a, b = bm25[q], ql.get(q, set())
        overlaps[q] = len(a & b) / len(a | b) if a | b else 0.0
    mean_overlap = sum(overlaps.values()) / len(overlaps)

    hybrid = q8.hybrid_rrf_topk(spark, sf_dir).collect()
    mix = {"both": 0, "lex_only": 0, "dense_only": 0}
    for r in hybrid:
        if r["lex_rank"] > 0 and r["dense_rank"] > 0:
            mix["both"] += 1
        elif r["lex_rank"] > 0:
            mix["lex_only"] += 1
        else:
            mix["dense_only"] += 1
    n_fused = sum(mix.values())

    h3 = q8.hybrid_rrf3_topk(spark, sf_dir).collect()
    mix3 = {"bm25": 0, "ql": 0, "dense": 0, "all_three": 0}
    for r in h3:
        present = [
            r["bm25_rank"] > 0, r["ql_rank"] > 0, r["dense_rank"] > 0
        ]
        if all(present):
            mix3["all_three"] += 1
        for name, p in zip(("bm25", "ql", "dense"), present):
            if p:
                mix3[name] += 1

    recalls, n_queries, n_rel = recall_audit(spark, sf_dir)
    maxsim_curve, n_maxsim_q = maxsim_prefilter_audit(spark, sf_dir)

    payload = {
        "sf_dir": sf_dir,
        "bm25_ql_jaccard_at10": {str(k): round(v, 4) for k, v in overlaps.items()},
        "bm25_ql_jaccard_mean": round(mean_overlap, 4),
        "hybrid_mix": mix,
        "hybrid_rows": n_fused,
        "hybrid3_presence": mix3,
        "hybrid3_rows": len(h3),
        "recall_at10": recalls,
        "recall_queries": n_queries,
        "recall_relevant_pairs": n_rel,
        "maxsim_prefilter_recall_at10": {str(c): v for c, v in maxsim_curve.items()},
        "maxsim_queries": n_maxsim_q,
    }

    lines = [
        "# Retrieval-quality audit (lexical + hybrid tier)",
        "",
        f"On `{sf_dir}` documents/embeddings. Regenerate with "
        "`python tools/retrieval_quality.py`.",
        "",
        "## Ranker diversity — BM25 vs query-likelihood (Dirichlet)",
        "",
        "Top-10 Jaccard overlap per fixed query "
        "(`queries_r8._BM25_QUERIES`):",
        "",
        "| query | overlap@10 |",
        "|---|---|",
    ]
    for q, v in sorted(overlaps.items()):
        lines.append(f"| {q} | {v:.4f} |")
    lines += [
        f"| **mean** | **{mean_overlap:.4f}** |",
        "",
        "The two rankers agree on heads and disagree on tails — the "
        "precondition for rank fusion to add information rather than "
        "echo one input.",
        "",
        "## Hybrid RRF source mixing",
        "",
        "Of the fused top-10 rows (5 query-by-example queries), how many "
        "came from each source's top-50:",
        "",
        "| source | rows |",
        "|---|---|",
        f"| in both rankers' top-50 | {mix['both']} |",
        f"| lexical top-50 only | {mix['lex_only']} |",
        f"| dense top-50 only | {mix['dense_only']} |",
        "",
        "Both sides contribute exclusive rows, i.e. the fusion "
        "arbitrates between rankers instead of echoing either; "
        "documents found by both are rewarded with summed reciprocal "
        "ranks, the RRF design intent.",
        "",
        "## Three-ranker fusion (hybrid_rrf3_topk) source presence",
        "",
        f"Of {len(h3)} fused top-10 rows, how many were retrieved by "
        "each ranker's top-50 (a row can count for several):",
        "",
        "| ranker | rows present |",
        "|---|---|",
        f"| BM25 | {mix3['bm25']} |",
        f"| query-likelihood | {mix3['ql']} |",
        f"| dense cosine | {mix3['dense']} |",
        f"| **all three** | **{mix3['all_three']}** |",
        "",
        "Values on all tiers are exact and oracle-gated "
        "(`doc_bm25_topk`, `doc_ql_dirichlet_topk`, `hybrid_rrf_topk`, "
        "`hybrid_rrf3_topk` in CORRECTNESS) — unlike the ANN tiers "
        "there is no recall approximation anywhere in lexical "
        "retrieval; the sections above are about ranking BEHAVIOR.",
        "",
        "## Known-item recall@10 vs the planted near-duplicate oracle "
        "(r9)",
        "",
        "Relevance oracle: verified n-gram Jaccard ≥ 0.3 (the dedup "
        "tier's exact measure over LSH candidates — corpus-derived "
        "ground truth, the quotation/near-duplicate pairs the synthetic "
        "corpus plants by construction). Each such doc becomes a "
        "query-by-example query (distinct terms, exclude_self); "
        f"{n_queries} queries, {n_rel} relevant-pair slots. "
        "recall@10 = |top-10 ∩ relevant| / min(10, |relevant|), "
        "macro-averaged — the task a contamination reviewer actually "
        "runs (find what quotes this document):",
        "",
        "| ranker | recall@10 |",
        "|---|---|",
    ] + [
        f"| {name} | {val:.4f} |" for name, val in recalls.items()
    ] + [
        "",
        "Reading — a measured NEGATIVE result, and the right one: the "
        "synthetic corpus draws every document from a ~31-term "
        "vocabulary, so near-duplicates share no distinguishing "
        "UNIGRAMS with their partner (every doc contains most of the "
        "vocabulary) — term-presence rankers rank by tf/length shape, "
        "not by verbatim overlap, and unigram BM25/QL/TF-IDF "
        "structurally cannot solve near-duplicate retrieval here (QL's "
        "length preference accidentally helps, since dup pairs are "
        "short). Dense cosine has no signal BY CONSTRUCTION: the "
        "fixture embeddings are independent of the text. The "
        "`ngram_overlap_control` row is the positive control — ranking "
        "by shared 5-gram count (the signal family the decontamination "
        "tier actually uses) against the same oracle — and its ~1.0 "
        "pins the protocol as correctly wired. This is exactly WHY the "
        "contamination tier is n-gram/MinHash-based with BM25 as the "
        "ranked REVIEW aid (`doc_bm25_contamination`), never the "
        "detector; on a natural-vocabulary corpus the lexical rows "
        "would read far higher, but the engineering conclusion stands.",
    ]
    lines += [
        "",
        "## Late-interaction (maxsim) prefilter recall vs exact (r12)",
        "",
        "`late_interaction_topk` cuts to `prefilter_candidates` docs "
        "per query (by distinct exact-term matches) before maxsim "
        "scoring. Ground truth: the SAME scorer with "
        "`prefilter_candidates=None` (every (query, doc) pair scored "
        "— the audit-baseline mode), so the gap is purely candidate "
        f"admission. Workload: {n_maxsim_q} queries (the 3 fixed gate "
        "queries + 15 query-by-example docs). recall@10 = "
        "|top-10(cut) ∩ top-10(exact)| / 10:",
        "",
        "| prefilter_candidates | recall@10 vs exact |",
        "|---|---|",
    ] + [
        f"| {c} | {v:.4f} |" for c, v in sorted(maxsim_curve.items())
    ] + [
        "",
        "The pinned floor (tests/test_retrieval_quality.py) holds the "
        "default-setting recall measured here; raise the default if "
        "the curve says the knee moved.",
    ]
    with open(os.path.join(REPO, "RETRIEVAL.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
