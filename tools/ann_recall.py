"""ANN recall audit: recall@k of every approximate top-k operator vs the
exact BLAS scan, on the fixture embeddings.

The approximation contract of lsh_topk / ivf_topk is "approximate in
RECALL, exact in VALUES" — this tool makes the recall half auditable per
round. Writes RECALL.md (human) and RECALL.json (machine) at the repo
root.

Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from pyspark.sql import functions as F

    from database_replicator_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_topk,
        lsh_topk_bucketed,
        neardup_pairs_blocked,
        neardup_pairs_lsh,
        pq_topk,
        topk_blas,
    )
    from database_replicator_spark.session import build_session
    from database_replicator_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = build_session("ann_recall")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)

    def pair_set(df):
        return {(r["query_id"], r["corpus_id"]) for r in df.collect()}

    truth = pair_set(topk_blas(emb, queries, k=k))
    n_queries = queries.count()

    variants = {
        "lsh_topk_bucketed(planes=6)": lsh_topk_bucketed(
            emb, queries, dim=64, k=k, num_planes=6, num_tables=1,
            multiprobe=0,
        ),
        "lsh_topk_bucketed(planes=4)": lsh_topk_bucketed(
            emb, queries, dim=64, k=k, num_planes=4, num_tables=1,
            multiprobe=0,
        ),
        "lsh_topk_bucketed(planes=6, multiprobe=2)": lsh_topk_bucketed(
            emb, queries, dim=64, k=k, num_planes=6, num_tables=1,
            multiprobe=2,
        ),
        "lsh_topk_bucketed(planes=6, tables=4, multiprobe=1)": lsh_topk_bucketed(
            emb, queries, dim=64, k=k, num_planes=6, num_tables=4, multiprobe=1
        ),
        "ivf_topk(sample, nprobe=2)": ivf_topk(
            emb, queries, k=k, nlist=16, nprobe=2, quantizer="sample"
        ),
        "ivf_topk(kmeans, nprobe=2)": ivf_topk(
            emb, queries, k=k, nlist=16, nprobe=2, quantizer="kmeans"
        ),
        "ivf_topk(kmeans, nprobe=4)": ivf_topk(
            emb, queries, k=k, nlist=16, nprobe=4, quantizer="kmeans"
        ),
        "pq_topk(m=8, ksub=32)": pq_topk(emb, queries, k=k, m=8, ksub=32),
        "pq_topk(m=8, ksub=32, rerank=50)": pq_topk(
            emb, queries, k=k, m=8, ksub=32, rerank=50
        ),
        "ivf_pq_topk(kmeans, nprobe=4, m=8, ksub=32)": ivf_pq_topk(
            emb, queries, k=k, nlist=16, nprobe=4, m=8, ksub=32,
            quantizer="kmeans",
        ),
    }
    import time

    results = {}
    times = {}
    for name, df in variants.items():
        t0 = time.perf_counter()
        got = pair_set(df)
        times[name] = round(time.perf_counter() - t0, 2)
        results[name] = round(len(got & truth) / len(truth), 4)

    # PCA-projected exact scan: dim 64 → 16 via the distributed Gram pass,
    # then the same BLAS top-k in projected space. This is the "shrink
    # before you index" lever — recall here bounds what any ANN index
    # built on the projected vectors can achieve, and the wall time
    # includes fitting the projection.
    from database_replicator_spark.operators.projection import (
        fit_pca,
        project_vectors,
    )

    for pk in (16, 32):
        name = f"pca({pk}) + exact scan"
        t0 = time.perf_counter()
        comps, mean, _ = fit_pca(emb, k=pk, vec_col="embedding", dim=64)
        p_corpus = project_vectors(emb, comps, mean, vec_col="embedding")
        p_queries = project_vectors(queries, comps, mean, vec_col="embedding")
        got = pair_set(topk_blas(p_corpus, p_queries, k=k, vec_col="projected"))
        times[name] = round(time.perf_counter() - t0, 2)
        results[name] = round(len(got & truth) / len(truth), 4)

    # Matryoshka prefix truncation: the TRAINING-FREE shrink lever (no
    # fitted projection — just the first d dims, renormalized). On
    # embeddings trained with MRL the prefix is information-ordered and
    # this approaches PCA recall; on generic embeddings (this fixture)
    # it is the floor PCA should beat — publishing both makes the trade
    # auditable. Zero fit cost; 64/d× smaller scan.
    for mk in (16, 32):
        name = f"matryoshka({mk}) + exact scan"
        t0 = time.perf_counter()
        sliced = emb.select(
            "vec_id", F.slice("embedding", 1, mk).alias("embedding")
        )
        got = pair_set(
            topk_blas(sliced, sliced.filter(F.col("vec_id") < 50), k=k)
        )
        times[name] = round(time.perf_counter() - t0, 2)
        results[name] = round(len(got & truth) / len(truth), 4)

    # Matryoshka prescreen → exact full-dim RERANK (the served
    # composition, gated as embedding_matryoshka_rerank): unlike the
    # prefix-only rows above, the final scores are exact full-dim
    # cosines, so recall@k is governed purely by whether the true top-k
    # survives the prefix top-c cut — c is the candidate-budget knob.
    from database_replicator_spark.operators.similarity import (
        prefix_rerank_topk,
    )

    for c in (25, 50):
        name = f"matryoshka(16) top-{c} + exact rerank"
        t0 = time.perf_counter()
        got = pair_set(
            prefix_rerank_topk(emb, queries, prefix_dim=16, candidates=c, k=k)
        )
        times[name] = round(time.perf_counter() - t0, 2)
        results[name] = round(len(got & truth) / len(truth), 4)

    # SQ8 scalar quantization (gated as similarity_sq8_topk): full-dim
    # code scan at 1 byte/dim — ranking error comes only from per-dim
    # quantization, so recall@k is near-exact and the win is the 8×
    # scan-IO cut, not candidate pruning.
    from database_replicator_spark.operators.similarity import sq8_topk

    name = "sq8(256 bins) code scan"
    t0 = time.perf_counter()
    got = pair_set(sq8_topk(emb, queries, k=k))
    times[name] = round(time.perf_counter() - t0, 2)
    results[name] = round(len(got & truth) / len(truth), 4)

    # IVF+SQ8 (gated as similarity_ivfsq_topk): probed-fraction recall
    # loss compounds with (near-zero) quantization loss — compare to
    # the ivf_topk rows to see the SQ8 cut costs essentially nothing.
    from database_replicator_spark.operators.similarity import ivf_sq8_topk

    for nprobe in (2, 4):
        name = f"ivf_sq8_topk(kmeans, nprobe={nprobe})"
        t0 = time.perf_counter()
        got = pair_set(
            ivf_sq8_topk(
                emb, queries, k=k, nlist=16, nprobe=nprobe,
                quantizer="kmeans",
            )
        )
        times[name] = round(time.perf_counter() - t0, 2)
        results[name] = round(len(got & truth) / len(truth), 4)

    # Near-dup PAIR recall: neardup_pairs_lsh vs the exact blocked scan
    # (ground truth) at the gated threshold — the same audit for the
    # symmetric-pairs operator that recall@k is for top-k.
    def unordered(df):
        return {(r["id1"], r["id2"]) for r in df.collect()}

    nd_threshold = 0.15
    nd_truth = unordered(neardup_pairs_blocked(emb, threshold=nd_threshold))
    nd_results = {}
    for name, df in {
        "neardup_pairs_lsh(planes=6)": neardup_pairs_lsh(
            emb, dim=64, threshold=nd_threshold, num_planes=6
        ),
        "neardup_pairs_lsh(planes=6, tables=4)": neardup_pairs_lsh(
            emb, dim=64, threshold=nd_threshold, num_planes=6, num_tables=4
        ),
        "neardup_pairs_lsh(planes=6, tables=8)": neardup_pairs_lsh(
            emb, dim=64, threshold=nd_threshold, num_planes=6, num_tables=8
        ),
    }.items():
        got = unordered(df)
        nd_results[name] = round(len(got & nd_truth) / max(len(nd_truth), 1), 4)

    payload = {
        "sf_dir": sf_dir,
        "k": k,
        "n_queries": n_queries,
        "truth_pairs": len(truth),
        "recall_at_k": results,
        "wall_seconds": times,
        "neardup_threshold": nd_threshold,
        "neardup_truth_pairs": len(nd_truth),
        "neardup_pair_recall": nd_results,
    }
    with open(os.path.join(REPO, "RECALL.json"), "w") as fh:
        json.dump(payload, fh, indent=2)

    lines = [
        "# ANN recall audit",
        "",
        f"recall@{k} vs exact BLAS top-k (`topk_blas`) on "
        f"`{sf_dir}/embeddings.parquet`, {n_queries} queries "
        f"({len(truth)} truth pairs). Regenerate with "
        "`python tools/ann_recall.py`.",
        "",
        "Since r12 `lsh_topk_bucketed` DEFAULTS to the measured sweet "
        "spot `tables=4, multiprobe=1` (recall 0.64 at ~1 s below, vs "
        "0.058 for the old single-table default); every variant row "
        "pins its config explicitly, so the table is default-invariant.",
        "",
        "| operator | recall@{k} | sec |".format(k=k),
        "|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(f"| `{name}` | {r:.4f} | {times[name]:.2f} |")
    lines += [
        "",
        f"Near-dup PAIR recall vs the exact blocked scan "
        f"(`neardup_pairs_blocked`, threshold {nd_threshold}, "
        f"{len(nd_truth)} truth pairs):",
        "",
        "| operator | pair recall |",
        "|---|---|",
    ]
    for name, r in nd_results.items():
        lines.append(f"| `{name}` | {r:.4f} |")
    lines += [
        "",
        "Both families are *value-exact on the candidates they surface* "
        "(the CORRECTNESS gate hashes them against a DuckDB oracle); the "
        "approximation budget lives entirely in recall, tuned by "
        "`num_planes` (fewer planes → bigger buckets → higher recall, "
        "more compute), `num_tables` (OR over independently-seeded hash "
        "tables: recall ≈ 1-(1-r)^T at T× shuffle-row cost), `multiprobe` "
        "(queries also probe Hamming-≤m neighbor buckets — corpus side "
        "unchanged, nearly free at corpus scale), and "
        "`nlist`/`nprobe`/`quantizer` for IVF — and `m`/`ksub`/`rerank` "
        "for PQ, whose ADC scan reads the m-byte code index instead of "
        "raw vectors (32x memory cut) and whose rerank stage re-scores "
        "top candidates with exact cosine, so only candidate CHOICE "
        "stays approximate. The matryoshka rows show the same prescreen→"
        "rerank structure on prefix dims: `candidates` is the knob "
        "(`prefix_rerank_topk`), and the rerank roughly DOUBLES the "
        "prefix-only recall at the same corpus scan width because the "
        "final ordering is exact full-dim cosine.",
        "",
        "Caveat: the fixture embeddings are near-uniform random, the "
        "worst case for any ANN index — these recalls are LOWER BOUNDS. "
        "On a corpus with real cluster structure the k-means quantizer "
        "clears recall ≥ 0.9 at nprobe=1 "
        "(tests/test_dedup_similarity.py::"
        "test_kmeans_quantizer_beats_sample_on_clustered_corpus). The "
        "same applies doubly to the `pca(k) + exact scan` rows: a "
        "near-uniform cloud has a FLAT spectrum, so dropping dimensions "
        "necessarily discards ~proportional variance (recall ≈ what random "
        "projection would give); on real embeddings — whose variance "
        "concentrates in a few hundred directions — the projected scan "
        "approaches full recall at a fraction of the matmul/index cost "
        "(tests/test_projection.py pins the clustered-fixture behavior).",
    ]

    # ---- planted-cluster fixture: the caveat above, MEASURED ----------
    # (r10 verdict noted the near-uniform fixture makes the table a
    # lower bound; this section shows the same operators on a corpus
    # with genuine cluster structure, so both regimes are auditable.)
    p_emb, p_queries = planted_fixture(spark)
    p_truth = pair_set(topk_blas(p_emb, p_queries, k=k))
    p_results, p_times = {}, {}
    for name, df in {
        "ivf_topk(kmeans, nprobe=1)": ivf_topk(
            p_emb, p_queries, k=k, nlist=16, nprobe=1, quantizer="kmeans"
        ),
        "ivf_topk(kmeans, nprobe=2)": ivf_topk(
            p_emb, p_queries, k=k, nlist=16, nprobe=2, quantizer="kmeans"
        ),
        "lsh_topk_bucketed(planes=6, tables=4)": lsh_topk_bucketed(
            p_emb, p_queries, dim=64, k=k, num_planes=6, num_tables=4,
            multiprobe=1,
        ),
        "pq_topk(m=8, ksub=32, rerank=50)": pq_topk(
            p_emb, p_queries, k=k, m=8, ksub=32, rerank=50
        ),
        "sq8(256 bins) code scan": sq8_topk(p_emb, p_queries, k=k),
        "matryoshka(16) top-50 + exact rerank": prefix_rerank_topk(
            p_emb, p_queries, prefix_dim=16, candidates=50, k=k
        ),
    }.items():
        import time as _time

        t0 = _time.perf_counter()
        got = pair_set(df)
        p_times[name] = round(_time.perf_counter() - t0, 2)
        p_results[name] = round(len(got & p_truth) / len(p_truth), 4)
    payload["planted"] = {
        "n_clusters": 100,
        "per_cluster": 50,
        "jitter": 0.06,
        "recall_at_k": p_results,
        "wall_seconds": p_times,
    }
    # re-dump WITH the planted section (the first dump above predates it)
    with open(os.path.join(REPO, "RECALL.json"), "w") as fh:
        json.dump(payload, fh, indent=2)
    lines += [
        "",
        "## Planted-cluster fixture (the caveat, measured)",
        "",
        "Same operators on a deterministic clustered corpus (100 planted "
        "clusters × 50 members, unit center + 0.06/coord jitter → "
        "within-cluster cosine ≈ 0.90, fixed-seed) where a query's true "
        "neighbors share its cluster — the regime real embedding corpora "
        "live in:",
        "",
        f"| operator | recall@{k} (planted) | recall@{k} (uniform) | sec |",
        "|---|---|---|---|",
    ]
    for name, r in p_results.items():
        uni = results.get(name)
        uni_s = f"{uni:.4f}" if uni is not None else "—"
        lines.append(f"| `{name}` | {r:.4f} | {uni_s} | {p_times[name]:.2f} |")
    lines += [
        "",
        "Cluster structure is what the quantizers exploit: the same "
        "index parameters that bound recall near 0.4-0.6 on the uniform "
        "cloud recover most of the true neighbors here, because a "
        "k-means cell (or LSH bucket) now COINCIDES with a neighbor set "
        "instead of slicing it arbitrarily.",
    ]
    with open(os.path.join(REPO, "RECALL.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(payload))
    return 0


def planted_fixture(spark, n_clusters: int = 100, per: int = 50, dim: int = 64):
    """Deterministic clustered embedding corpus: unit-normalized cluster
    centers + fixed-seed jittered members (numpy RandomState — stable
    across processes/platforms), queries = one member of each of the
    first 50 clusters. Built driver-side (5k × 64 floats — fixture-sized
    metadata, not corpus-scale data)."""
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.RandomState(12345)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # jitter is per-COORDINATE noise: scale s gives a perturbation of
    # norm ≈ s·√dim against unit centers, so within-cluster cosine ≈
    # 1/√(1+s²·dim). s=0.06 at dim=64 → |ε|≈0.48 → cos≈0.90: tight
    # enough that true neighbors share the cluster, loose enough that
    # ranking inside a cluster is non-trivial. (First cut used s=0.25 —
    # |ε|≈2.0, noise swamping the unit centers: a uniform cloud wearing
    # a cluster costume, measured recalls said so.)
    for c in range(n_clusters):
        vecs = centers[c] + rng.normal(scale=0.06, size=(per, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        for v in vecs:
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(
        (F.col("vec_id") % per == 0) & (F.col("vec_id") < 50 * per)
    )
    return emb, queries


if __name__ == "__main__":
    raise SystemExit(main())
