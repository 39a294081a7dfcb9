"""Empirical scaling probe: measure flagship corpus operators at 1x/4x/16x
the bench corpus and report the scaling exponent over the 4x→16x leg.

The cost models in SCALING.md are arguments; this tool is the measurement.
Corpus multiples are synthesized by copying sf0.1 documents with a
per-copy vocabulary prefix on every word — copies share NO shingles, so
cross-copy candidate pairs are zero by construction and the workload
grows exactly linearly in documents/tokens. An operator whose measured
exponent is ~1.0 scales by data; >1.2 indicates super-linear behavior
(quadratic buckets, driver hot spots) worth investigating BEFORE the
100 TB cluster does.

Usage: python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1]
                                   [--out /tmp/scale_probe]
Prints a markdown table (paste into SCALING.md §Measured scaling).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: 1x is the fixed-overhead floor (sub-second jobs measure the scheduler,
#: not the operator); the exponent is computed over the 4x→16x leg where
#: per-op compute dominates.
MULTIPLES = [1, 4, 16]


def spill_snapshot(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over every stage so
    far, via the UI REST API — the stable public metrics surface (the
    AppStatusStore py4j signature changed across Spark majors). Returns
    (0, 0) when the UI is off or unreachable, so the probe still runs on
    a UI-less session (spill column reads 0/n-a)."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return (0, 0)
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            stages = _json.load(r)
    except Exception:
        return (0, 0)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def synthesize(spark, sf_dir: str, out_root: str):
    """x{k} corpora: k disjoint-vocabulary copies of the base documents."""
    from pyspark.sql import functions as F

    from database_replicator_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "documents")
    n = base.count()
    paths = {}
    for k in MULTIPLES:
        path = os.path.join(out_root, f"x{k}")
        copies = []
        for c in range(k):
            prefixed = base.select(
                (F.col("doc_id") + F.lit(c * n)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(F.lit(f"c{c}_"), w),
                    ),
                ).alias("text"),
                "lang",
                F.concat(F.lit(f"c{c}_"), F.col("source")).alias("source"),
                "n_chars",
            )
            copies.append(prefixed)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def probe_ops(spark, path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        # noop sink: full materialization, no count()-only branch pruning
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        # spill delta rides the same run: SCALING.md's sub-linear
        # exponents are wall-time on a 128 GiB box — the spill column
        # shows whether the 16x legs stayed memory-resident or started
        # paying for disk (r9 verdict stretch #9)
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    out = {}

    def exact_dedup():
        from database_replicator_spark.operators.dedup import exact_dedup_groups

        mat(exact_dedup_groups(docs))

    def minhash_lsh():
        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        mat(lsh_candidate_pairs(minhash_signatures(doc_shingles(docs), num_hashes=12)))

    def span_coverage():
        from database_replicator_spark.operators.corpus import (
            duplicate_span_coverage,
        )

        mat(duplicate_span_coverage(docs))

    def token_budget():
        from database_replicator_spark.operators.corpus import select_token_budget

        words = F.split(F.col("text"), " ")
        t = docs.select(
            "doc_id",
            (
                F.size(F.array_distinct(words)).cast("double")
                / F.size(words).cast("double")
            ).alias("score"),
            F.size(words).cast("long").alias("n_tokens"),
        )
        total = t.agg(F.sum("n_tokens")).collect()[0][0]
        mat(select_token_budget(t, budget=int(total) // 5))

    def quality():
        from database_replicator_spark.operators.textops import quality_filter

        mat(quality_filter(docs))

    def classifier():
        from database_replicator_spark.operators.textops import hashed_linear_score

        mat(hashed_linear_score(docs))

    def keyword_postings():
        from database_replicator_spark.operators.textops import (
            normalize_text_expr,
        )

        toks = docs.select(
            "doc_id",
            F.explode(
                F.split(
                    normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                    " ",
                )
            ).alias("term"),
        ).distinct()
        mat(
            toks.groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20).alias(
                    "postings_head"
                ),
            )
            .filter(F.col("df") >= 10)
        )

    def cross_source_fps():
        from database_replicator_spark.operators.textops import (
            normalize_text_expr,
        )

        norm = normalize_text_expr(F.coalesce(F.col("text"), F.lit("")))
        fp = docs.select(
            F.md5(F.array_join(F.slice(F.split(norm, " "), 1, 16), " ")).alias(
                "fingerprint"
            ),
            "source",
        ).distinct()
        a, b = fp.alias("a"), fp.alias("b")
        mat(
            a.join(
                b,
                (F.col("a.fingerprint") == F.col("b.fingerprint"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source1"),
                F.col("b.source").alias("source2"),
            )
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )

    def source_overlap():
        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            minhash_signatures,
        )

        sh = doc_shingles(docs)
        sig = minhash_signatures(sh, num_hashes=12)
        ssig = (
            sig.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(*[F.min(F.col("sig")[s]).alias(f"h{s}") for s in range(12)])
        )
        a, b = ssig.alias("a"), ssig.alias("b")
        matching = sum(
            (F.col(f"a.h{s}") == F.col(f"b.h{s}")).cast("int")
            for s in range(12)
        )
        mat(
            a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
            .select(
                F.col("a.source").alias("source1"),
                F.col("b.source").alias("source2"),
                matching.cast("bigint").alias("matching_slots"),
            )
        )

    def global_rank_gini():
        # the scale-sensitive half of events_activity_gini: a GLOBAL
        # rank of every row via the bucketed two-phase path (forced
        # distributed), then the scalar Gini aggregate
        from database_replicator_spark.operators.cumsum import (
            grouped_running_sum,
        )

        vals = docs.select("doc_id", F.col("n_chars").alias("x"))
        ranked = grouped_running_sum(
            vals.withColumn("_one", F.lit(1)), [], "_one", "doc_id",
            out_col="r", order_col="x", ascending=True, mode="distributed",
        )
        mat(
            ranked.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum(F.col("r") * F.col("x")).alias("w"),
            )
        )

    def span_merge():
        from database_replicator_spark.operators.corpus import merged_span_report

        mat(merged_span_report(docs))

    def _probe_qterms():
        from database_replicator_spark.operators.retrieval import doc_tokens

        # per-copy query terms (the '_dup' rare term of each disjoint
        # vocabulary copy), so queries AND candidates grow linearly with
        # the corpus — probing the whole build+rank path, not a
        # fixed-candidate scan
        return (
            doc_tokens(docs)
            .select("term")
            .distinct()
            .filter(F.col("term").endswith("_dup"))
            .select(F.abs(F.xxhash64("term")).alias("query_id"), "term")
        )

    def bm25():
        from database_replicator_spark.operators.retrieval import bm25_topk

        mat(bm25_topk(docs, _probe_qterms(), k=10, prefilter_buckets=8))

    def tfidf():
        from database_replicator_spark.operators.retrieval import (
            tfidf_cosine_topk,
        )

        # the family's one corpus-wide extra: full-vocabulary df for the
        # document norms — the probe measures that build scaling with
        # the corpus, not just the postings-bounded match
        mat(tfidf_cosine_topk(docs, _probe_qterms(), k=10, prefilter_buckets=8))

    def ql_jm():
        from database_replicator_spark.operators.retrieval import ql_jm_topk

        mat(ql_jm_topk(docs, _probe_qterms(), k=10, prefilter_buckets=8))

    def bm25_prf():
        from database_replicator_spark.operators.retrieval import (
            bm25_prf_topk,
        )

        # two passes + expansion over one shared stats build; queries
        # grow linearly with the corpus like the other retrieval probes
        mat(
            bm25_prf_topk(
                docs, _probe_qterms(), k=10, fb_k=5, fb_terms=3,
                prefilter_buckets=8,
            )
        )

    for name, fn in [
        ("exact_dedup", exact_dedup),
        ("minhash_lsh_pairs", minhash_lsh),
        ("duplicate_span_coverage", span_coverage),
        ("merged_span_report", span_merge),
        ("bm25_topk", bm25),
        ("tfidf_cosine_topk", tfidf),
        ("ql_jm_topk", ql_jm),
        ("bm25_prf_topk", bm25_prf),
        ("select_token_budget", token_budget),
        ("quality_filter", quality),
        ("hashed_linear_score", classifier),
        ("keyword_postings", keyword_postings),
        ("cross_source_fps", cross_source_fps),
        ("source_overlap_minhash", source_overlap),
        ("global_rank_gini_distributed", global_rank_gini),
    ]:
        fn()  # warm (codegen + python workers)
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            # spill from the FIRST (cold) run: the second may rescan
            # cached shuffle files and under-report pressure
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def synthesize_embeddings(spark, sf_dir: str, out_root: str):
    """x{k} embedding corpora: k id-offset copies with a per-copy
    deterministic rotation of the coordinates (roll by copy index) so
    copies neither collide in LSH buckets systematically nor change the
    per-row work — vector count grows exactly linearly."""
    from pyspark.sql import functions as F

    from database_replicator_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = base.count()
    dim = len(base.first()["embedding"])
    paths = {}
    for k in MULTIPLES:
        path = os.path.join(out_root, f"emb_x{k}")
        copies = []
        for c in range(k):
            roll = c % dim
            rolled = F.concat(
                F.slice(F.col("embedding"), roll + 1, dim - roll),
                F.slice(F.col("embedding"), 1, roll),
            )
            copies.append(
                base.select(
                    (F.col("vec_id") + F.lit(c * n)).alias("vec_id"),
                    rolled.alias("embedding"),
                )
            )
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def probe_embedding_ops(spark, path: str, dim: int = 64) -> dict[str, float]:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 20)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        # spill delta rides the same run: SCALING.md's sub-linear
        # exponents are wall-time on a 128 GiB box — the spill column
        # shows whether the 16x legs stayed memory-resident or started
        # paying for disk (r9 verdict stretch #9)
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    def pq_encode_scan():
        from database_replicator_spark.operators.similarity import (
            pq_encode,
            pq_sample_codebooks,
        )

        books = pq_sample_codebooks(emb, m=8, ksub=16)
        mat(pq_encode(emb, books))

    def pq_adc_topk():
        from database_replicator_spark.operators.similarity import pq_topk

        mat(pq_topk(emb, queries, k=10, m=8, ksub=16, quantizer="sample"))

    def ivfpq_probe():
        from database_replicator_spark.operators.similarity import ivf_pq_topk

        mat(
            ivf_pq_topk(
                emb, queries, k=10, nlist=16, nprobe=2, m=8, ksub=16,
                quantizer="sample",
            )
        )

    def coverage():
        from database_replicator_spark.operators.similarity import coverage_sample

        mat(
            coverage_sample(
                emb, per_cell=50, nlist=16, prefilter_buckets=8
            )
        )

    def semdedup():
        from database_replicator_spark.operators.similarity import (
            semantic_dedup,
        )

        # nlist ∝ n is THE SemDeDup scale lever: per-cell pairwise work
        # is |cell|², so fixed nlist would probe at exponent ~2 while
        # cells held at ~125 vectors keep the total linear (the paper
        # runs 50k clusters over LAION for the same reason)
        n = emb.count()
        nlist = max(16, int(n) // 125)
        mat(semantic_dedup(emb, tau=0.4, nlist=nlist, quantizer="sample"))

    def sq8():
        from database_replicator_spark.operators.similarity import sq8_topk

        mat(sq8_topk(emb, queries, k=10))

    out = {}
    for name, fn in [
        ("pq_encode", pq_encode_scan),
        ("pq_adc_topk", pq_adc_topk),
        ("ivf_pq_topk", ivfpq_probe),
        ("coverage_sample", coverage),
        ("semantic_dedup_nlist_scaled", semdedup),
        ("sq8_topk", sq8),
    ]:
        fn()
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            # spill from the FIRST (cold) run: the second may rescan
            # cached shuffle files and under-report pressure
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def synthesize_graph(spark, sf_dir: str, out_root: str):
    """x{k} co-purchase inputs: the distinct (order, part) pairs of the
    base lineitem, replicated as k id-offset disjoint copies — k
    disconnected copies of the same graph, so edges AND nodes grow
    exactly linearly and cross-copy joins are empty by construction."""
    from pyspark.sql import functions as F

    from database_replicator_spark.sources.catalog import load_table

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    row = ps.agg(
        F.max("l_orderkey").alias("mo"), F.max("l_partkey").alias("mp")
    ).collect()[0]
    mo, mp = int(row["mo"]) + 1, int(row["mp"]) + 1
    paths = {}
    for k in MULTIPLES:
        path = os.path.join(out_root, f"graph_x{k}")
        copies = [
            ps.select(
                (F.col("l_orderkey") + F.lit(c * mo)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(c * mp)).alias("l_partkey"),
            )
            for c in range(k)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def probe_graph_ops(spark, path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    ps = spark.read.parquet(path)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        # spill delta rides the same run: SCALING.md's sub-linear
        # exponents are wall-time on a 128 GiB box — the spill column
        # shows whether the 16x legs stayed memory-resident or started
        # paying for disk (r9 verdict stretch #9)
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    # the gate's r14 edge construction: one orderkey shuffle — per-order
    # collect_set + sorted-array a<b pair transform (fan-out = basket
    # size), replacing the r8-r13 distinct + self-join
    half_plan = (
        ps.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("p")
        )
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
    )

    def edge_build():
        # the gate's edge phase: in-array pair generation + pair dedup +
        # symmetric mirror
        half = half_plan
        mat(
            half.unionByName(
                half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        )

    # PR probe isolates the iterations: edges pre-checkpointed OUTSIDE
    # the timed body (the gate does the same via checkpoint_edges=False
    # over a checkpointed half). unit=10⁹: the 16x graph has ~5·10⁵
    # nodes, past the unit=10¹² guard bound (85·n·unit < 2⁶³) — exactly
    # the knob the guard's error message prescribes.
    half_c = half_plan.localCheckpoint()
    edges_c = half_c.unionByName(
        half_c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def pagerank_3iter():
        from database_replicator_spark.operators.graph import pagerank_units

        mat(
            pagerank_units(
                edges_c, iters=3, checkpoint_edges=False, symmetric=True,
                unit=10**9,
            )
        )

    def hits_2iter():
        from database_replicator_spark.operators.graph import hits_units

        # directed half-edges as the bipartite-ish input: two
        # edge⋈value joins + two aggregates per iteration, values
        # bounded by the measured-degree guard
        hubs, auths = hits_units(half_c, iters=2)
        mat(hubs)
        mat(auths)

    out = {}
    for name, fn in [
        ("copurchase_edge_build", edge_build),
        ("pagerank_3iter_symmetric", pagerank_3iter),
        ("hits_2iter", hits_2iter),
    ]:
        fn()
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            # spill from the FIRST (cold) run: the second may rescan
            # cached shuffle files and under-report pressure
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out




def probe_r10_ops(spark, path: str) -> dict[str, float]:
    """Round-10 tier: KLL quantiles, phrase proximity, media hashes,
    record linkage — per-copy grains so groups/queries/entities grow
    linearly with the corpus (the family contract of this harness)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    out = {}

    from database_replicator_spark.operators.textops import (
        normalize_text_expr,
    )

    norm = normalize_text_expr(F.coalesce(F.col("text"), F.lit("")))

    def _variants(width: int, pert_at: int):
        """Fixed-width byte-grid items + one perturbed variant each —
        the gates' planted-near-dup construction, per corpus copy."""
        base = docs.select(
            "doc_id",
            F.rpad(F.substring(norm, 1, width), width, "x").alias("s"),
        )
        orig = base.select((F.col("doc_id") * 2).alias("id"), "s")
        pert = base.select(
            (F.col("doc_id") * 2 + 1).alias("id"),
            F.concat(
                F.substring(F.col("s"), 1, pert_at - 1),
                F.lit("#"),
                F.substring(F.col("s"), pert_at + 1, width - pert_at),
            ).alias("s"),
        )
        return orig.unionByName(pert).withColumn(
            "payload", F.encode(F.col("s"), "UTF-8")
        )

    def kll_quantiles():
        from database_replicator_spark.operators.kll import (
            kll_group_quantiles,
        )

        # groups = per-copy sources (linear in copies); per-group count
        # constant → the sketch stays in its exact regime at every leg
        v = docs.select("source", F.col("n_chars").cast("bigint").alias("v"))
        mat(kll_group_quantiles(v, ["source"], "v", [50, 90, 99], k=16384))

    def phrase_topk():
        from database_replicator_spark.operators.retrieval import (
            phrase_window_topk,
        )

        # one phrase query per vocabulary copy → queries AND candidates
        # grow linearly (the bm25 probe's contract)
        prefixes = (
            docs.select(
                F.regexp_extract("source", r"^(c\d+)_", 1).alias("p")
            )
            .distinct()
            .filter(F.col("p") != "")
        )
        pairs = prefixes.select(
            F.abs(F.xxhash64("p")).alias("query_id"),
            F.concat(F.col("p"), F.lit("_hash")).alias("term_a"),
            F.concat(F.col("p"), F.lit("_join")).alias("term_b"),
        )
        mat(phrase_window_topk(docs, pairs, k=10, window=8))

    def dhash_pairs():
        from database_replicator_spark.operators.multimodal import (
            byte_decode,
            media_dhash,
            media_table,
            phash_pairs,
        )

        items = _variants(49, 11)
        media = media_table(items, "id", "payload", "image/x-gray8")
        hashes = media_dhash(media, decoder=byte_decode, dim=49)
        mat(phash_pairs(hashes, max_hamming=6, dim=48, n_bands=4))

    def audio_pairs():
        from database_replicator_spark.operators.multimodal import (
            audio_fingerprint,
            media_table,
            phash_pairs,
        )

        items = _variants(234, 50)
        media = media_table(items, "id", "payload", "audio/x-pcm8")
        sigs = audio_fingerprint(media)
        mat(phash_pairs(sigs, max_hamming=6, dim=60, n_bands=4))

    def entity_linkage():
        from database_replicator_spark.operators.dedup import (
            blocking_edit_pairs,
        )

        items = _variants(40, 20)
        mat(
            blocking_edit_pairs(
                items, id_col="id", text_col="s", block_len=8, max_distance=2
            )
        )

    for name, fn in [
        ("kll_group_quantiles", kll_quantiles),
        ("phrase_window_topk", phrase_topk),
        ("media_dhash_pairs", dhash_pairs),
        ("audio_fingerprint_pairs", audio_pairs),
        ("blocking_edit_pairs", entity_linkage),
    ]:
        fn()  # warm (codegen + python workers)
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def probe_r11_ops(spark, path: str, work_root: str) -> dict[str, float]:
    """Round-11 tier: REAL-container media hashing (BMP mint + native
    decode, WAV mint + chunk-walk decode), the bounded CDC replay
    harness (changes/epochs grow linearly with the corpus), and the
    maintained-profile ingest+merge path."""
    import os as _os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    out = {}

    from database_replicator_spark.operators.textops import (
        normalize_text_expr,
    )

    norm = normalize_text_expr(F.coalesce(F.col("text"), F.lit("")))

    def _variants(width: int, pert_at: int):
        base = docs.select(
            "doc_id",
            F.rpad(F.substring(norm, 1, width), width, "x").alias("s"),
        )
        orig = base.select((F.col("doc_id") * 2).alias("id"), "s")
        pert = base.select(
            (F.col("doc_id") * 2 + 1).alias("id"),
            F.concat(
                F.substring(F.col("s"), 1, pert_at - 1),
                F.lit("#"),
                F.substring(F.col("s"), pert_at + 1, width - pert_at),
            ).alias("s"),
        )
        return orig.unionByName(pert)

    def bmp_real_pairs():
        from database_replicator_spark.operators.multimodal import (
            bmp_prefix,
            default_decoder,
            media_dhash,
            media_table,
            phash_pairs,
        )

        items = _variants(49, 30)
        rows = [
            F.concat(
                F.encode(F.substring(F.col("s"), r * 7 + 1, 7), "UTF-8"),
                F.lit(b"\x00"),
            )
            for r in reversed(range(7))
        ]
        items = items.withColumn(
            "payload", F.concat(F.lit(bmp_prefix(7, 7)), *rows)
        )
        media = media_table(items, "id", "payload", "image/bmp")
        hashes = media_dhash(media, decoder=default_decoder, dim=49)
        mat(phash_pairs(hashes, max_hamming=6, dim=48, n_bands=4))

    def wav_real_pairs():
        from database_replicator_spark.operators.multimodal import (
            audio_fingerprint,
            decode_wav,
            media_table,
            phash_pairs,
            wav_prefix,
        )

        items = _variants(234, 100).withColumn(
            "payload",
            F.concat(F.lit(wav_prefix(234)), F.encode(F.col("s"), "UTF-8")),
        )
        media = media_table(items, "id", "payload", "audio/wav")
        sigs = audio_fingerprint(media, decoder=decode_wav)
        mat(phash_pairs(sigs, max_hamming=6, dim=60, n_bands=4))

    def cdc_replay():
        from database_replicator_spark.streaming.change_stream import (
            replay_change_log,
        )

        ch = docs.select(
            F.col("doc_id").cast("bigint").alias("change_id"),
            F.lit("docs").alias("table"),
            F.when(F.col("doc_id") % 10 == 0, "delete")
            .when(F.col("doc_id") % 3 == 0, "insert")
            .otherwise("update")
            .alias("op"),
            F.col("doc_id").cast("string").alias("pk"),
            F.to_json(F.struct("n_chars", "source")).alias("payload"),
        )
        latest, _state = replay_change_log(
            spark,
            ch,
            _os.path.join(work_root, "cdc_replay"),
            epochs=3,
            n_buckets=8,
        )
        mat(latest)

    def profile_maintain():
        from database_replicator_spark.streaming.profile_ingest import (
            ProfileMaintainer,
            read_profile,
        )

        tgt = _os.path.join(work_root, "profile")
        m = ProfileMaintainer(target_dir=tgt)
        m.ingest_batch(docs.select("doc_id", "n_chars", "lang"), 0)
        mat(read_profile(spark, tgt))

    for name, fn in [
        ("bmp_native_decode_pairs", bmp_real_pairs),
        ("wav_native_decode_pairs", wav_real_pairs),
        ("cdc_replay_3epoch", cdc_replay),
        ("profile_maintain_and_merge", profile_maintain),
    ]:
        fn()  # warm (codegen + python workers)
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def probe_r12_ops(spark, path: str, work_root: str) -> dict[str, float]:
    """Round-12 tier: the COMPOSED corpus build (clean → near-dup CC →
    caps → temperature mix → split → pack, via queries_r12._e2e_stages
    on a symlinked fixture dir), WebDataset tar write+read, the
    compressed-codec media pairs (GIF/LZW, PNG/DEFLATE+filters), the
    pgoutput wire decode, and the chunk→BM25→maxP retrieval build.
    Synthesized copies share no vocabulary, so cross-copy candidates and
    contamination are zero by construction — workloads grow linearly."""
    import os as _os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    out = {}

    # fixture dir for the sf_dir-shaped entry points: symlink the
    # synthesized parquet in as documents.parquet (no copy)
    fix_dir = _os.path.join(work_root, "fixdir")
    _os.makedirs(fix_dir, exist_ok=True)
    link = _os.path.join(fix_dir, "documents.parquet")
    if _os.path.islink(link) or _os.path.exists(link):
        try:
            _os.remove(link)
        except IsADirectoryError:
            import shutil as _sh

            _sh.rmtree(link)
    _os.symlink(_os.path.abspath(path), link)

    def corpus_build_chain():
        from database_replicator_spark.queries_r12 import _e2e_stages

        mat(_e2e_stages(spark, fix_dir)["packed"])

    def wds_write_read():
        from database_replicator_spark.operators.multimodal import media_table
        from database_replicator_spark.sources.webdataset import (
            read_tar_shards,
            write_tar_shards,
        )

        outdir = _os.path.join(work_root, "wds")
        import shutil as _sh

        _sh.rmtree(outdir, ignore_errors=True)
        payload = docs.select(
            "doc_id",
            F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
                "payload"
            ),
        )
        media = media_table(payload, "doc_id", "payload",
                            "application/octet-stream")
        write_tar_shards(media, outdir, n_shards=16)
        mat(read_tar_shards(spark, outdir))

    from database_replicator_spark.operators.textops import (
        normalize_text_expr,
    )

    norm = normalize_text_expr(F.coalesce(F.col("text"), F.lit("")))

    def _variants(width: int, pert_at: int):
        base = docs.select(
            "doc_id",
            F.rpad(F.substring(norm, 1, width), width, "x").alias("s"),
        )
        orig = base.select((F.col("doc_id") * 2).alias("id"), "s")
        pert = base.select(
            (F.col("doc_id") * 2 + 1).alias("id"),
            F.concat(
                F.substring(F.col("s"), 1, pert_at - 1),
                F.lit("#"),
                F.substring(F.col("s"), pert_at + 1, width - pert_at),
            ).alias("s"),
        )
        return orig.unionByName(pert)

    def _codec_pairs(mint):
        from database_replicator_spark.operators.multimodal import (
            default_decoder,
            media_dhash,
            media_table,
            phash_pairs,
        )

        items = _variants(49, 30).mapInPandas(mint, "id long, payload binary")
        media = media_table(items, "id", "payload", "image/x-probe")
        hashes = media_dhash(media, decoder=default_decoder, dim=49)
        mat(phash_pairs(hashes, max_hamming=6, dim=48, n_bands=4))

    def gif_pairs():
        from database_replicator_spark.operators.multimodal import gif_bytes

        def mint(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf):
                    yield pd.DataFrame({
                        "id": pdf["id"],
                        "payload": [gif_bytes(x.encode(), 7, 7)
                                    for x in pdf["s"]],
                    })

        _codec_pairs(mint)

    def png_pairs():
        from database_replicator_spark.operators.multimodal import png_bytes

        def mint(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf):
                    yield pd.DataFrame({
                        "id": pdf["id"],
                        "payload": [
                            png_bytes(x.encode(), 7, 7,
                                      filter_type=int(i) % 5)
                            for i, x in zip(pdf["id"], pdf["s"])
                        ],
                    })

        _codec_pairs(mint)

    def pgoutput_decode():
        from database_replicator_spark.sources.pgoutput import (
            PgOutputEncoder,
            decode_pgoutput_stream,
        )

        src = docs.select(
            F.pmod(F.col("doc_id"), F.lit(8)).cast("int").alias("shard"),
            "doc_id",
            F.col("n_chars").cast("long").alias("v"),
        )

        def enc_dec(pdf):
            import pandas as pd

            pdf = pdf.sort_values("doc_id")
            shard = int(pdf["shard"].iloc[0])
            e = PgOutputEncoder(relid=1 + shard, namespace="public",
                                relname="docs", columns=["id", "v"],
                                key_cols=["id"])
            e.relation().begin(xid=shard)
            for _, r in pdf.iterrows():
                e.insert([str(int(r["doc_id"])), str(int(r["v"]))])
            e.commit()
            rows = decode_pgoutput_stream(e.stream())
            return pd.DataFrame([
                {"shard": shard, "seq": r["seq"],
                 "id": int(r["columns"]["id"])}
                for r in rows
            ])

        mat(src.groupBy("shard").applyInPandas(
            enc_dec, "shard int, seq long, id long"))

    def rag_chunk_maxp():
        from pyspark.sql import Window

        from database_replicator_spark.operators.corpus import (
            chunk_long_docs,
        )
        from database_replicator_spark.operators.retrieval import bm25_scores

        chunks = chunk_long_docs(docs, budget=64, overlap=16).select(
            (F.col("doc_id") * 4096 + F.col("chunk_id")).alias("chunk_key"),
            F.col("doc_id").alias("parent"),
            "chunk_id",
            "chunk_text",
        )
        qdf = spark.createDataFrame(
            [(0, "c0_dup"), (0, "c0_merge"), (1, "c0_spark"),
             (1, "c0_window"), (2, "c0_vector"), (2, "c0_stream")],
            "query_id long, term string",
        )
        scores = bm25_scores(
            chunks, qdf, id_col="chunk_key", text_col="chunk_text"
        ).select("query_id", F.col("doc_id").alias("chunk_key"),
                 "score_units")
        scored = scores.join(
            chunks.select("chunk_key", "parent", "chunk_id"), on="chunk_key"
        )
        w = Window.partitionBy("query_id", "parent").orderBy(
            F.col("score_units").desc(), F.col("chunk_id").asc()
        )
        mat(scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))

    for name, fn in [
        ("corpus_build_e2e_chain", corpus_build_chain),
        ("webdataset_write_read", wds_write_read),
        ("gif_lzw_decode_pairs", gif_pairs),
        ("png_deflate_decode_pairs", png_pairs),
        ("pgoutput_encode_decode", pgoutput_decode),
        ("rag_chunk_maxp_index", rag_chunk_maxp),
    ]:
        fn()  # warm (codegen + python workers)
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def probe_r13_ops(spark, path: str) -> dict[str, float]:
    """Round-13 tier: the FENCED containment candidate path (prefix-
    filtered postings join → exact pair-local verify — the r12 verdict's
    required probe for the one candidate generator that had no scale
    row), the hybrid chunk-RAG fusion build (BM25 + hashed-feature dense
    + RRF + maxP), and the partial-row-image merge fold. Copies share no
    vocabulary, so candidate pairs grow linearly by construction."""
    from pyspark.sql import Window, functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        # measurement hygiene (r13): force a driver GC so Spark's
        # ContextCleaner releases broadcasts/cache blocks left by prior
        # legs, and let the UI metrics settle so the warm run's
        # late-finalizing stages don't land inside this delta
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        m0, d0 = spill_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        elapsed = time.perf_counter() - t0
        time.sleep(1)
        m1, d1 = spill_snapshot(spark)
        return {"s": elapsed, "spill_mb": ((m1 - m0) + (d1 - d0)) / 1048576.0}

    out = {}

    def containment_prefix_pairs():
        from database_replicator_spark.operators.dedup import (
            containment_pairs,
            doc_shingles,
            postings_candidates,
        )

        sh = doc_shingles(docs)
        cand = postings_candidates(sh, threshold=0.6)
        mat(containment_pairs(sh, candidates=cand, threshold=0.6))

    def hybrid_fusion_build():
        from database_replicator_spark.operators.corpus import chunk_long_docs
        from database_replicator_spark.operators.retrieval import (
            bm25_scores,
            rrf_fuse,
        )
        from database_replicator_spark.queries_r13 import _hashed_feats

        chunks = chunk_long_docs(docs, budget=64, overlap=16).select(
            (F.col("doc_id") * 4096 + F.col("chunk_id")).alias("chunk_key"),
            F.col("doc_id").alias("parent"),
            "chunk_id",
            "chunk_text",
        )
        qdf = spark.createDataFrame(
            [(0, "c0_dup"), (0, "c0_merge"), (1, "c0_spark"),
             (1, "c0_window"), (2, "c0_vector"), (2, "c0_stream")],
            "query_id long, term string",
        )
        scores = bm25_scores(
            chunks, qdf, id_col="chunk_key", text_col="chunk_text"
        ).select("query_id", F.col("doc_id").alias("chunk_key"),
                 "score_units")
        w_lex = Window.partitionBy("query_id").orderBy(
            F.col("score_units").desc(), F.col("chunk_key").asc()
        )
        lex = (
            scores.withColumn("rank", F.row_number().over(w_lex))
            .filter(F.col("rank") <= 50)
            .select("query_id", F.col("chunk_key").alias("doc_id"), "rank")
        )
        cfeat = _hashed_feats(
            chunks, "chunk_key", "chunk_text"
        ).withColumnRenamed("w", "cw")
        qtext = qdf.groupBy("query_id").agg(
            F.concat_ws(" ", F.collect_list("term")).alias("qtext")
        )
        qfeat = _hashed_feats(qtext, "query_id", "qtext").withColumnRenamed(
            "w", "qw"
        )
        dots = (
            cfeat.join(F.broadcast(qfeat), on="bucket")
            .groupBy("query_id", "chunk_key")
            .agg(F.sum(F.col("cw") * F.col("qw")).alias("dot_units"))
            .filter(F.col("dot_units") != 0)
        )
        w_den = Window.partitionBy("query_id").orderBy(
            F.col("dot_units").desc(), F.col("chunk_key").asc()
        )
        dense = (
            dots.withColumn("rank", F.row_number().over(w_den))
            .filter(F.col("rank") <= 50)
            .select("query_id", F.col("chunk_key").alias("doc_id"), "rank")
        )
        fused = rrf_fuse(lex, dense, k=50, rrf_k=60)
        w_best = Window.partitionBy("query_id", "parent").orderBy(
            F.col("rrf_score").desc(), F.col("doc_id").asc()
        )
        mat(
            fused.withColumn("parent", F.expr("doc_id DIV 4096"))
            .withColumn("_rn", F.row_number().over(w_best))
            .filter(F.col("_rn") == 1)
        )

    def toast_merge_fold():
        from database_replicator_spark.operators.latest import (
            merged_latest_by_key,
        )

        # 3 changes per doc: full-image insert then two partial updates
        base = docs.select(
            F.col("doc_id").cast("string").alias("pk"),
            F.col("n_chars").cast("long").alias("v"),
        )
        ins = base.select(
            "pk", F.lit(1).alias("change_id"), F.lit("insert").alias("op"),
            F.concat(
                F.lit('{"big":"'), F.col("pk"), F.lit('","v":"'),
                F.col("v").cast("string"), F.lit('"}'),
            ).alias("payload"),
        )
        up1 = base.select(
            "pk", F.lit(2).alias("change_id"), F.lit("update").alias("op"),
            F.concat(
                F.lit('{"v":"'), (F.col("v") + 1).cast("string"), F.lit('"}')
            ).alias("payload"),
        )
        up2 = base.select(
            "pk", F.lit(3).alias("change_id"), F.lit("update").alias("op"),
            F.concat(
                F.lit('{"w":"'), (F.col("v") + 2).cast("string"), F.lit('"}')
            ).alias("payload"),
        )
        changes = ins.unionByName(up1).unionByName(up2)
        mat(merged_latest_by_key(changes, ["pk"], "change_id"))

    for name, fn in [
        ("containment_prefix_pairs", containment_prefix_pairs),
        ("hybrid_fusion_build", hybrid_fusion_build),
        ("toast_merge_fold", toast_merge_fold),
    ]:
        fn()  # warm (codegen + python workers)
        r1, r2 = timed(fn), timed(fn)
        best = r1 if r1["s"] <= r2["s"] else r2
        out[name] = {
            "s": round(best["s"], 3),
            "spill_mb": round(r1["spill_mb"], 1),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument(
        "--only",
        default="docs,emb,graph,r10,r11,r12,r13",
        help="comma list of probe families to run: docs, emb, graph, r10, r11, r12, r13",
    )
    args = ap.parse_args()
    fams = {f.strip() for f in args.only.split(",") if f.strip()}

    from database_replicator_spark.session import build_session

    # Probe sessions run the 16x-64x legs, where the AQE
    # initial-partition ceiling needs its LARGE-shuffle value
    # (session.py leaves it unset locally = core count): 512 keeps the
    # biggest probe shuffles from spilling (measured 12 GiB at ceiling
    # 32 on the r13 containment leg, 0 at 512 — AQE's advisory target
    # still coalesces the small ones). Env-overridable; this is the
    # measured probe-scale value.
    os.environ.setdefault("SPARK_GRAFT_AQE_INITIAL", "512")
    spark = build_session(
        "scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = {k: {} for k in MULTIPLES}
    paths = None
    if "docs" in fams or "r10" in fams or "r11" in fams or "r12" in fams:
        paths = synthesize(spark, args.sf_dir, args.out)
    if "docs" in fams:
        for k, p in paths.items():
            results[k].update(probe_ops(spark, p))
    if "emb" in fams:
        epaths = synthesize_embeddings(spark, args.sf_dir, args.out)
        for k, p in epaths.items():
            results[k].update(probe_embedding_ops(spark, p))
    if "graph" in fams:
        gpaths = synthesize_graph(spark, args.sf_dir, args.out)
        for k, p in gpaths.items():
            results[k].update(probe_graph_ops(spark, p))
    if "r10" in fams:
        for k, p in paths.items():
            results[k].update(probe_r10_ops(spark, p))
    if "r11" in fams:
        for k, p in paths.items():
            results[k].update(
                probe_r11_ops(spark, p, os.path.join(args.out, f"work_x{k}"))
            )
    if "r12" in fams:
        if paths is None:
            paths = synthesize(spark, args.sf_dir, args.out)
        for k, p in paths.items():
            results[k].update(
                probe_r12_ops(spark, p, os.path.join(args.out, f"work_x{k}"))
            )
    if "r13" in fams:
        if paths is None:
            paths = synthesize(spark, args.sf_dir, args.out)
        for k, p in paths.items():
            results[k].update(probe_r13_ops(spark, p))

    ops = list(results[MULTIPLES[0]])
    print(
        "| operator | "
        + " | ".join(f"{k}x" for k in MULTIPLES)
        + " | exponent | 16x spill (MiB) |"
    )
    print("|---|" + "---|" * (len(MULTIPLES) + 2))
    for op in ops:
        rows = [results[k][op] for k in MULTIPLES]
        lo, hi = rows[-2]["s"], rows[-1]["s"]
        ratio = MULTIPLES[-1] / MULTIPLES[-2]
        exp = math.log(hi / lo) / math.log(ratio) if lo > 0 else float("nan")
        cells = " | ".join(f"{r['s']:.2f}s" for r in rows)
        print(f"| {op} | {cells} | {exp:.2f} | {rows[-1]['spill_mb']:.0f} |")

    shutil.rmtree(args.out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
