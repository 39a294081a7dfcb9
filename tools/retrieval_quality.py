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

Writes RETRIEVAL.md at the repo root and prints one JSON line.

Usage: python tools/retrieval_quality.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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

    payload = {
        "sf_dir": sf_dir,
        "bm25_ql_jaccard_at10": {str(k): round(v, 4) for k, v in overlaps.items()},
        "bm25_ql_jaccard_mean": round(mean_overlap, 4),
        "hybrid_mix": mix,
        "hybrid_rows": n_fused,
        "hybrid3_presence": mix3,
        "hybrid3_rows": len(h3),
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
        "retrieval; this audit is about ranking BEHAVIOR, not fidelity.",
    ]
    with open(os.path.join(REPO, "RETRIEVAL.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
