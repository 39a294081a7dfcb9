"""End-to-end corpus build: the batch composition of the pipeline
operators, runnable from the CLI (``corpus-build``).

Stages (each individually gated/tested elsewhere; this module only
composes them and accounts for every document):

  ingest (JSONL or parquet) → exact dedup → quality rule-cascade →
  optional classifier gate (hashed-feature linear score) → optional
  near-dup cluster dedup / span masking / token-budget selection →
  optional temperature-α mixture down-sample → train/val/test split →
  token-budget sequence packing → deterministic shard shuffle → write

Scale notes: every stage is one of the audited operators — the
composition adds NO new shuffles beyond the stages' own (quality: doc
grain; dedup: fingerprint; packing: (split, source) windows; shuffle:
shard key). Stage counts come from one tiny aggregate per stage, and the
output is written shard-partitioned (fresh directory, overwrite mode) so
a training loader reads shards sequentially; a rebuild into the SAME
directory that is also the input should route through
``util.staged_overwrite`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_corpus(
    spark: SparkSession,
    source: str,
    out_dir: str,
    text_field: str = "text",
    budget: int = 1024,
    n_shards: int = 8,
    alpha: float | None = None,
    split_fractions: dict[str, float] | None = None,
    seed: int = 0,
    min_tokens: int = 10,
    near_dup: bool = False,
    jaccard_threshold: float = 0.2,
    semantic_dedup: bool = False,
    semantic_threshold: float = 0.85,
    span_mask: bool = False,
    chunk_dedup: bool = False,
    token_budget: int | None = None,
    classifier_threshold: float | None = None,
    export_jsonl: bool = False,
    source_priority: dict | None = None,
    with_datasheet: bool = False,
) -> dict:
    """Run the batch corpus build; returns the per-stage accounting dict
    (every input document ends in exactly one bucket: corrupt, rejected,
    duplicate, downsampled, or written)."""
    from .operators.corpus import (
        dataset_split,
        deterministic_shuffle,
        pack_sequences,
        temperature_sample,
    )
    from .operators.dedup import exact_dedup_groups
    from .operators.textops import (
        normalize_text_expr,
        quality_filter,
        token_count_expr,
    )
    from .sources.text_corpus import read_jsonl_documents

    import time as _time

    report: dict = {"source": source}
    stage_seconds: dict[str, float] = {}
    _t = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t
        now = _time.perf_counter()
        stage_seconds[stage] = round(now - _t, 2)
        _t = now

    if source.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
        docs, corrupt = read_jsonl_documents(spark, source, text_field=text_field)
        report["n_corrupt"] = corrupt.count()
    else:
        from .sources.catalog import load_table

        docs = load_table(spark, source, "documents")
        report["n_corrupt"] = 0
    docs = docs.localCheckpoint(eager=False)
    report["n_ingested"] = docs.count()
    _mark("ingest")

    # exact dedup FIRST: content-hash ingestion ids make textual dupes
    # SHARE an id, so dedup must precede any id-keyed join. One survivor
    # per fingerprint; dropDuplicates covers shared-id rows (textually
    # identical by construction — survivor metadata is arbitrary-of-equal).
    groups = exact_dedup_groups(docs)
    survivors = groups.select(F.col("keep_id").alias("doc_id"))
    docs = (
        docs.join(survivors, on="doc_id")
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=False)
    )
    after_dedup = docs.count()
    report["n_exact_duplicates"] = report["n_ingested"] - after_dedup
    _mark("exact_dedup")

    # quality rule cascade (integer rules, explainable drops)
    flagged = quality_filter(docs, min_tokens=min_tokens)
    kept_ids = flagged.filter(F.col("keep")).select("doc_id")
    docs = docs.join(kept_ids, on="doc_id").localCheckpoint(eager=False)
    kept_count = docs.count()
    report["n_quality_rejected"] = after_dedup - kept_count
    after_dedup = kept_count
    _mark("quality")

    if classifier_threshold is not None:
        # model-based quality gate AFTER the rule cascade: the hashed
        # bag-of-words linear scorer (deterministic fake weights here;
        # trained coefficients at deployment) — map-only, zero shuffle,
        # so ordering it after the cheap integer rules costs nothing
        from .operators.textops import hashed_linear_score

        scored = hashed_linear_score(docs, text_col=text_field)
        passing = scored.filter(
            F.col("score") >= F.lit(classifier_threshold)
        ).select("doc_id")
        docs = docs.join(passing, on="doc_id").localCheckpoint(eager=False)
        kept_count = docs.count()
        report["n_classifier_rejected"] = after_dedup - kept_count
        after_dedup = kept_count
        _mark("classifier")
    else:
        report["n_classifier_rejected"] = 0

    if near_dup:
        # near-dup CLUSTER dedup: LSH candidates → verified Jaccard pairs
        # → connected components → keep each cluster's min doc_id. The
        # quadratic verify is confined to LSH buckets; the cluster (not
        # the pair) is the unit of deduplication.
        from .operators.corpus import connected_components
        from .operators.dedup import (
            doc_shingles,
            jaccard_pairs,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        # checkpointed: sh feeds the signature pipeline and the
        # verifier's semi-join (r13: one shingle explode instead of two)
        sh = doc_shingles(docs).localCheckpoint()
        cand = lsh_candidate_pairs(minhash_signatures(sh, num_hashes=12))
        pairs = jaccard_pairs(sh, candidates=cand, threshold=jaccard_threshold)
        labels = connected_components(
            docs.select("doc_id"), pairs.select("doc1", "doc2"), id_col="doc_id"
        )
        if source_priority:
            # cluster survivor = best-ranked source, not min id: when a
            # dup cluster spans curated and crawl copies, keep curated
            from .operators.corpus import select_canonicals

            rank = F.coalesce(
                *[
                    F.when(F.col("source") == s, F.lit(int(r)))
                    for s, r in source_priority.items()
                ],
                F.lit(1_000_000),  # unranked sources lose to any ranked one
            )
            prio = docs.select("doc_id", rank.alias("_rank"))
            keepers = select_canonicals(
                labels, prio, id_col="doc_id", priority_col="_rank"
            ).select(F.col("canonical_id").alias("doc_id"))
        else:
            keepers = labels.filter(F.col("node") == F.col("cluster_id")).select(
                F.col("node").alias("doc_id")
            )
        docs = docs.join(keepers, on="doc_id").localCheckpoint(eager=False)
        kept = docs.count()
        report["n_neardup_removed"] = after_dedup - kept
        after_dedup = kept
        _mark("near_dup")
    else:
        report["n_neardup_removed"] = 0

    if semantic_dedup:
        # SEMANTIC cluster dedup with no external embeddings: the
        # feature-hashed vectors (textops.hashed_embedding) feed the same
        # LSH-pair → connected-components machinery the embedding tier
        # uses; paraphrase-level duplicates that share few exact shingles
        # still land in one cluster. Swap a learned encoder in by
        # materializing (doc_id, embedding) yourself — the stage shape is
        # identical.
        from .operators.corpus import connected_components
        from .operators.similarity import neardup_pairs_lsh
        from .operators.textops import hashed_embedding

        emb = hashed_embedding(docs, text_col=text_field).withColumnRenamed(
            "doc_id", "vec_id"
        )
        pairs = neardup_pairs_lsh(
            emb, dim=64, threshold=semantic_threshold, num_planes=6, num_tables=4
        )
        labels = connected_components(
            docs.select("doc_id"),
            pairs.select(F.col("id1").alias("doc1"), F.col("id2").alias("doc2")),
            id_col="doc_id",
        )
        keepers = labels.filter(F.col("node") == F.col("cluster_id")).select(
            F.col("node").alias("doc_id")
        )
        docs = docs.join(keepers, on="doc_id").localCheckpoint(eager=False)
        kept = docs.count()
        report["n_semantic_removed"] = after_dedup - kept
        after_dedup = kept
        _mark("semantic_dedup")
    else:
        report["n_semantic_removed"] = 0

    if span_mask:
        # span-level dedup: drop word positions covered by cross-document
        # duplicated 8-grams; doc-level near-dup (above) keeps cluster
        # canonicals, this removes residual verbatim boilerplate INSIDE
        # surviving docs (Lee et al. 2022)
        from .operators.corpus import mask_duplicate_spans

        masked = mask_duplicate_spans(docs, text_col=text_field)
        docs = (
            docs.drop(text_field)
            .join(masked, on="doc_id")
            .withColumnRenamed("clean_text", text_field)
            .localCheckpoint(eager=False)
        )
        stats = docs.agg(
            F.coalesce(F.sum("n_dropped"), F.lit(0)).alias("w"),
            F.coalesce(F.sum((F.col("n_dropped") > 0).cast("long")), F.lit(0)).alias("d"),
        ).collect()[0]
        report["n_span_masked_docs"] = int(stats["d"])
        report["n_span_words_dropped"] = int(stats["w"])
        docs = docs.drop("n_dropped")
        _mark("span_mask")
    else:
        report["n_span_masked_docs"] = 0
        report["n_span_words_dropped"] = 0

    if chunk_dedup:
        # WITHIN-document boilerplate removal (nav/footer blocks a page
        # repeats internally) — runs after cross-document span masking;
        # text is replaced by the first-occurrence chunks in order
        from .operators.corpus import dedup_repeated_chunks

        cleaned = dedup_repeated_chunks(docs, text_col=text_field)
        docs = (
            docs.drop(text_field)
            .join(
                cleaned.select(
                    "doc_id", F.col("clean_text").alias(text_field), "n_dropped"
                ),
                on="doc_id",
            )
            .localCheckpoint(eager=False)
        )
        report["n_chunk_dedup_docs"] = int(
            docs.filter(F.col("n_dropped") > 0).count()
        )
        docs = docs.drop("n_dropped")
        _mark("chunk_dedup")
    else:
        report["n_chunk_dedup_docs"] = 0

    if token_budget is not None:
        # best-first fill to the token target: lexical-diversity priority,
        # exact inclusive running total (two-phase bucketed cumsum)
        from .operators.corpus import select_token_budget

        words = F.split(
            normalize_text_expr(F.coalesce(F.col(text_field), F.lit(""))), " "
        )
        scored = docs.select(
            "doc_id",
            (
                F.size(F.array_distinct(words)).cast("double")
                / F.greatest(F.size(words), F.lit(1)).cast("double")
            ).alias("score"),
            F.size(words).cast("long").alias("n_tokens"),
        )
        sel = select_token_budget(scored, budget=token_budget)
        docs = docs.join(sel.select("doc_id"), on="doc_id").localCheckpoint(
            eager=False
        )
        kept = docs.count()
        report["n_over_token_budget"] = after_dedup - kept
        after_dedup = kept
        _mark("token_budget")
    else:
        report["n_over_token_budget"] = 0

    if alpha is not None:
        docs = temperature_sample(
            docs, strata_col="source", alpha=alpha, seed=seed
        ).drop("n_docs", "keep_threshold", "sample_key")
        kept = docs.count()
        report["n_downsampled"] = after_dedup - kept
        after_dedup = kept
        _mark("temperature_mix")
    else:
        report["n_downsampled"] = 0

    docs = dataset_split(
        docs, split_fractions or {"train": 0.98, "val": 0.01, "test": 0.01},
        seed=seed,
    ).drop("split_key")

    # token counts once, then pack within (split, source)
    docs = docs.withColumn(
        "n_tokens",
        F.size(
            F.split(normalize_text_expr(F.coalesce(F.col(text_field), F.lit(""))), " ")
        ),
    )
    packed = pack_sequences(
        docs.withColumn("_pk", F.concat_ws("|", "split", "source")),
        budget=budget,
        token_col="n_tokens",
        order_col="doc_id",
        part_col="_pk",
    ).drop("_pk")
    out = deterministic_shuffle(packed, n_shards=n_shards, seed=seed).drop("draw")

    (
        out.repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{out_dir}/corpus")
    )
    _mark("pack_shuffle_write")
    report["n_written"] = after_dedup
    report["n_shards"] = n_shards
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report["split_counts"] = per_split
    report["total_tokens"] = int(
        out.agg(F.coalesce(F.sum("n_tokens"), F.lit(0))).collect()[0][0]
    )
    if export_jsonl:
        from .sources.text_corpus import export_jsonl_shards

        manifest = export_jsonl_shards(out, out_dir)
        report["jsonl_manifest"] = manifest
        _mark("export_jsonl")
    if with_datasheet:
        # data card over the WRITTEN corpus (not the raw input): the
        # numbers a consumer of this build actually gets
        import json as _json

        sheet = corpus_datasheet(spark, f"{out_dir}/corpus", text_field=text_field)
        with open(f"{out_dir}/datasheet.json", "w") as fh:
            _json.dump(sheet, fh, indent=2, default=str)
        report["datasheet"] = sheet
        _mark("datasheet")
    report["stage_seconds"] = stage_seconds
    return report


def corpus_datasheet(
    spark: SparkSession,
    source: str,
    text_field: str = "text",
    approximate: bool = False,
) -> dict:
    """Corpus data card ("datasheet"): the summary a team publishes next
    to a training corpus — size, composition, length distribution,
    duplication and quality rates — composed from the audited operators
    in a handful of small aggregates.

    ``approximate=False`` (default, fine through ~10^9 docs) uses exact
    percentiles and exact distinct-fingerprint counts; ``approximate=True``
    is the 100 TB path: `approx_percentile` for lengths and the mergeable
    KMV sketch (operators/sketch.py) for the duplicate-rate estimate, so
    no single task ever sorts or holds the full value set.
    """
    import os as _os

    from .operators.sketch import kmv_estimate, kmv_sketch
    from .operators.textops import (
        fingerprint_expr,
        lang_id_expr,
        quality_filter,
        token_count_expr,
    )
    from .sources.catalog import ensure_configured, load_table

    if _os.path.exists(_os.path.join(source, "documents.parquet")):
        docs = load_table(spark, source, "documents")
    else:
        # a built corpus directory (shard-partitioned parquet) — read it
        # directly; the card then describes what a consumer actually gets
        ensure_configured(spark)
        docs = spark.read.parquet(source)
    t = F.col(text_field)
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        token_count_expr(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        lang_id_expr(t).alias("lang_pred"),
        fingerprint_expr(t).alias("fp"),
    ).localCheckpoint(eager=False)

    sheet: dict = {"source_dir": source}

    overall = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    ).collect()[0]
    n_docs = overall["n_docs"]
    sheet["n_docs"] = n_docs
    sheet["total_tokens"] = overall["total_tokens"]
    sheet["total_chars"] = overall["total_chars"]

    sheet["per_source"] = {
        r["source"]: {
            "n_docs": r["n"],
            "n_tokens": r["tok"],
            "doc_share": round(r["n"] / n_docs, 6) if n_docs else 0.0,
        }
        for r in base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").cast("long").alias("tok"),
        )
        .collect()
    }
    sheet["per_lang"] = {
        r["lang"]: r["n"]
        for r in base.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    agree = base.filter(
        (F.col("lang_pred") == "en") == (F.col("lang") == "en")
    ).count()
    sheet["lang_id_agreement"] = round(agree / n_docs, 6) if n_docs else None

    pct_fn = "approx_percentile" if approximate else "percentile"
    pct = base.selectExpr(
        f"{pct_fn}(n_tokens, array(0.1, 0.5, 0.9)) AS p"
    ).collect()[0]["p"]
    sheet["token_percentiles"] = {
        "p10": float(pct[0]), "p50": float(pct[1]), "p90": float(pct[2])
    }

    if approximate:
        est = kmv_estimate(
            kmv_sketch(base.withColumn("_g", F.lit(1)), ["_g"], "fp")
        ).collect()[0]["distinct_est"]
        distinct_fp = float(est)
    else:
        distinct_fp = float(base.select("fp").distinct().count())
    sheet["distinct_fingerprints"] = round(distinct_fp, 1)
    sheet["duplicate_rate"] = (
        round(1.0 - distinct_fp / n_docs, 6) if n_docs else None
    )

    flagged = quality_filter(docs, text_col=text_field)
    kept = flagged.filter(F.col("keep")).count()
    sheet["quality_keep_rate"] = round(kept / n_docs, 6) if n_docs else None
    reasons = {
        r["reject_reason"]: r["n"]
        for r in flagged.filter(~F.col("keep"))
        .groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sheet["quality_reject_reasons"] = reasons
    return sheet


def embedding_datasheet(
    spark: SparkSession,
    source: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Embedding-table companion to :func:`corpus_datasheet`: vector
    count, dimensionality, norm distribution (degenerate zero/near-zero
    vectors are an upstream-encoder bug worth catching before they hit
    the unit-normalizing similarity operators), and per-label counts when
    a label column exists. One pass; the norm math is a codegen
    `aggregate` over the array — no Python."""
    from .sources.catalog import load_table

    emb = load_table(spark, source, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    base = emb.select(
        id_col,
        F.size(F.col(vec_col)).alias("dim"),
        norm.alias("norm"),
        *(["label"] if "label" in emb.columns else []),
    )
    overall = base.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("dim").alias("n_dims_seen"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.min("norm").alias("norm_min"),
        F.expr("percentile(norm, 0.5)").alias("norm_p50"),
        F.max("norm").alias("norm_max"),
        F.sum((F.col("norm") < 1e-6).cast("long")).alias("n_degenerate"),
    ).collect()[0]
    sheet = {k: (float(v) if isinstance(v, float) else v)
             for k, v in overall.asDict().items()}
    sheet["source_dir"] = source
    if "label" in emb.columns:
        sheet["per_label"] = {
            str(r["label"]): r["n"]
            for r in base.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    return sheet
