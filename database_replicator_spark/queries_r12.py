"""Round-12 query-surface entries.

The headline gate is ``corpus_build_e2e`` — the COMPOSITION of the corpus
tier into the single pipeline a real pretraining data build executes
(clean → near-dup clustering → domain caps → temperature mix → split →
pack), oracle-gated over the final packed output. Every stage is already
an individually-gated operator; this gate pins that they COMPOSE: each
stage consumes the previous stage's survivors, the temperature rates are
derived from the pipeline-internal (post-cap) counts, and the DuckDB
oracle re-derives the whole chain in one recursive-CTE query.

``corpus_build_attrition`` is the same chain reported as the per-source
funnel (ingested → clean → near-dup survivor → capped → mixed), the
datasheet table a corpus build prints alongside its output.

Reference parity note: the reference engine (a replication CLI) has no
corpus pipeline; this is mandate surface (LLM-training-data tier). The
stage semantics are the public ones: C4/Gopher quality rules, MinHash-LSH
near-dup clustering (Broder; Leskovec-Rajaraman-Ullman ch.3), RefinedWeb
per-domain caps, XLM-R temperature mixing, GPT-style sequence packing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Defined BEFORE the .queries import: queries.py imports queries_r13,
# which reads these two constants — placing them first keeps them
# available even when this module is the import-cycle entry point
# (queries_r12 → .queries → queries_r13 → queries_r12 partially
# initialized).
_RAG_DOC_K = 5
#: chunk_key = doc_id·4096 + chunk_id — collision-free while a doc has
#: <4096 chunks (needs >196k tokens at step 48; the quality tier caps
#: docs at 50k tokens long before that)
_RAG_KEY_SPAN = 4096

from .queries import query
from .queries_llm import (
    _CAPPED_CTE,
    _LSH_BANDS,
    _MINHASH_BASE,
    _MINHASH_MINS,
    _SHINGLES_CTE,
)
from .queries_pipeline import _H60, _SPAN, _SPLIT_FRACTIONS, _split_case_sql
from .sources.catalog import load_table

# ---------------------------------------------------------------------------
# corpus_build_e2e — stage constants. Chosen so every stage DOES WORK at
# the gate scales: per-source near-dup survivors range 17-24 at
# sf0.001/0.01, so cap=20 bites the large sources while leaving the
# small ones uncapped — post-cap counts stay NON-uniform, which keeps
# the temperature thresholds non-trivial (<2^60) and the mix stage live.
# ---------------------------------------------------------------------------
_E2E_CAP = 20
_E2E_CAP_SEED = 101
_E2E_TEMP_SEED = 102
_E2E_SPLIT_SEED = 103
_E2E_BUDGET = 512

#: The shared stage chain as DuckDB CTEs (everything through ``mixed``).
#: CTE naming: the quality CTEs are prefixed q* so they can coexist with
#: the minhash chain (whose canonical fragment names its base ``base``
#: too — here ``mbase``); ``norm``/``sh`` from _SHINGLES_CTE are shared
#: by the quality tokens, the contamination probe, the minhash
#: signatures, and the final token counts — one definition, four users,
#: exactly like the Spark side reuses one shingle DataFrame.
_E2E_CHAIN = f"""
    {_SHINGLES_CTE.strip().rstrip()},
    qbase AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS n_stop,
             toks
      FROM norm
    ),
    qtop AS (
      SELECT doc_id, MAX(c) AS max_tok_count FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM qbase, UNNEST(toks) AS u(tok) GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    qual AS (
      SELECT b.doc_id,
             (CASE WHEN b.n_tokens < 10 THEN 'too_short'
                   WHEN b.n_tokens > 50000 THEN 'too_long'
                   WHEN b.n_stop * 1000 < b.n_tokens * 20 THEN 'low_stopword'
                   WHEN t.max_tok_count * 100 > b.n_tokens * 20 THEN 'repetitive'
              END) IS NULL AS keep_quality
      FROM qbase b JOIN qtop t USING (doc_id)
    ),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    canon AS (
      SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_canonical
      FROM fp
    ),
    bshingle AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    ),
    dsz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_hit
      FROM sh t JOIN bshingle b ON t.shingle = b.shingle
      WHERE t.doc_id % 50 != 0 GROUP BY 1
    ),
    contaminated AS (
      SELECT h.doc_id FROM hits h JOIN dsz s USING (doc_id)
      WHERE h.n_hit * 2 >= s.n_sh
    ),
    accepted AS (
      SELECT d.doc_id
      FROM documents d
      JOIN qual q ON q.doc_id = d.doc_id
      JOIN canon c ON c.doc_id = d.doc_id
      LEFT JOIN contaminated ct ON ct.doc_id = d.doc_id
      WHERE q.keep_quality AND c.is_canonical AND d.doc_id % 50 != 0
        AND ct.doc_id IS NULL
    ),
    mbase AS ({_MINHASH_BASE}),
    sig AS (
      SELECT doc_id,
       {_MINHASH_MINS}
      FROM mbase GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.band, b.band_sig
      FROM sig, UNNEST([{_LSH_BANDS}]) AS u(b)
    ),
    {_CAPPED_CTE.strip()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT co.doc1, co.doc2
      FROM co
      JOIN cand ON cand.doc1 = co.doc1 AND cand.doc2 = co.doc2
      JOIN dsz s1 ON s1.doc_id = co.doc1
      JOIN dsz s2 ON s2.doc_id = co.doc2
      WHERE inter / (s1.n_sh + s2.n_sh - inter) >= 0.2
    ),
    edges AS (
      SELECT doc1 AS src, doc2 AS dst FROM pairs
      UNION ALL
      SELECT doc2, doc1 FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS m FROM documents
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
    ),
    comp AS (
      SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node
    ),
    neardup AS (
      SELECT MIN(a.doc_id) AS doc_id
      FROM accepted a JOIN comp c ON c.doc_id = a.doc_id
      GROUP BY c.cluster_id
    ),
    survd AS (
      SELECT d.doc_id, d.source FROM documents d JOIN neardup USING (doc_id)
    ),
    capranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_H60.format(expr=f"'{_E2E_CAP_SEED}:' || CAST(doc_id AS VARCHAR)")} ASC,
                        doc_id ASC) AS sel_rank
      FROM survd
    ),
    capped_docs AS (
      SELECT doc_id, source FROM capranked WHERE sel_rank <= {_E2E_CAP}
    ),
    tstats AS (SELECT source, COUNT(*) AS n_docs FROM capped_docs GROUP BY source),
    tmin AS (SELECT MIN(n_docs) AS n_min FROM tstats),
    thr AS (
      SELECT s.source,
             CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / s.n_docs) * {float(_SPAN)!r})
                  AS BIGINT) AS keep_threshold
      FROM tstats s CROSS JOIN tmin m
    ),
    mixed AS (
      SELECT c.doc_id, c.source
      FROM capped_docs c JOIN thr USING (source)
      WHERE {_H60.format(expr=f"'{_E2E_TEMP_SEED}:' || CAST(c.doc_id AS VARCHAR)")} < thr.keep_threshold
    )
"""


def _e2e_stages(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Build the composed pipeline and return every stage's survivor
    set; each caller (packed-output gate, attrition-funnel gate,
    determinism test) builds its own chain from the parquet inputs —
    nothing is shared across calls. Stage-by-stage:

      1. clean — quality cascade ∧ exact-dedup canonical ∧ not the
         benchmark slice ∧ not benchmark-contaminated (the
         corpus_clean_view acceptance, re-composed here so ONE shingle
         relation feeds both the contamination probe and stage 2).
      2. near-dup — MinHash-LSH verified pairs (Jaccard ≥ 0.2) →
         connected components over the FULL corpus (cluster structure is
         a content property, independent of which member survived stage
         1); per cluster the minimum-doc_id CLEAN survivor is kept, so a
         cluster whose canonical member failed quality still contributes
         its best survivor.
      3. caps — per-source cap (≤ {cap} docs, seeded hash draw).
      4. mix — temperature-0.5 down-sampling with rates derived from the
         POST-CAP per-source counts (the pipeline's own mixture, not the
         raw corpus's).
      5. split — deterministic 90/5/5 train/val/test.
      6. pack — token-budget packing within each split, doc_id order.

    Scale shape: every stage is the already-audited operator (bucketed
    LSH, hash-min CC with lineage cuts, one window per cap group,
    broadcast 20-row rate table, map-only split, two-pass range packing)
    — composing them adds joins on the doc_id grain only, no new shuffle
    class. The shingle relation is computed once and feeds three
    consumers."""
    from .operators.corpus import (
        cap_per_group,
        connected_components,
        dataset_split,
        pack_sequences,
        temperature_sample,
    )
    from .operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from .operators.textops import (
        fingerprint_expr,
        normalize_text_expr,
        quality_filter,
    )

    # (r14: the chain's intermediates are localCheckpointed, not cached —
    # the r12 cross-call cache-leak list is gone with the caches; the
    # checkpointed blocks are reclaimed by the ContextCleaner when the
    # previous call's DataFrames are garbage collected, and bench's
    # clearCache() has nothing to preserve. `sig` is the one cache left,
    # unpersisted before this function returns.)
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: clean (quality ∧ canonical ∧ ¬benchmark ∧ ¬contaminated)
    qual = quality_filter(docs).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    w = Window.partitionBy("fingerprint")
    canon = docs.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )
    # Materialize the shingle relation: FOUR consumers (benchmark slice,
    # contamination hits, per-doc sizes, minhash signatures) would each
    # re-run the explode+window+distinct otherwise — at gate scale that
    # was 4 full shingle builds per chain execution. r14: localCheckpoint
    # instead of cache marks, for the shingle relation AND every
    # doc-grain stage below — the r13 after-plan still carried 191
    # exchanges because InMemoryRelation keeps the full child plan
    # (every stage's optimizer pass re-carried the whole upstream
    # chain); checkpoints truncate lineage at each stage boundary.
    # Interleaved 3-round A/B with identical outputs (r14): checkpoints
    # beat the cache marks every round — e2e ~6.8 → ~5.6 s, attrition
    # ~6.5 → ~5.4 s. (At 100 TB, these checkpoints are materialized
    # parquet/Delta stages — same compute-once shape, durable medium.)
    sh = doc_shingles(docs).localCheckpoint()
    bench_sh = (
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    # Fraction-based decontamination (differs DELIBERATELY from
    # corpus_clean_view's any-overlap FLAG): a doc is contaminated when
    # ≥50% of its distinct shingles appear in the benchmark slice — the
    # "substantial overlap" rule real pipelines use (GPT-3 appx C /
    # PaLM-style), because any-single-n-gram overlap degenerates with
    # corpus size (flags 96% of sf0.1 docs; the fraction rule flags
    # exactly the planted quotation docs at every scale). Integer-exact:
    # n_hit*2 >= n_sh, no float division.
    doc_sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench_sh), on="shingle", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contaminated = (
        hits.join(doc_sz, on="doc_id")
        .filter(F.col("n_hit") * 2 >= F.col("n_sh"))
        .select("doc_id")
        .withColumn("_hit", F.lit(True))
    )
    accepted = (
        docs.select("doc_id")
        .join(qual, on="doc_id")
        .join(canon, on="doc_id")
        .join(contaminated, on="doc_id", how="left")
        .filter(
            F.col("keep_quality")
            & F.col("is_canonical")
            & (F.col("doc_id") % 50 != 0)
            & ~F.coalesce(F.col("_hit"), F.lit(False))
        )
        .select("doc_id")
    )
    accepted = accepted.localCheckpoint()

    # stage 2: near-dup CC over the full corpus; keep the min-doc_id
    # clean survivor per cluster (the dedup_components construction)
    sig = minhash_signatures(sh, num_hashes=12).cache()
    cand = lsh_candidate_pairs(sig)
    pairs = jaccard_pairs(sh, candidates=cand, threshold=0.2)
    comp = connected_components(
        docs.select("doc_id"),
        pairs,
        id_col="doc_id",
        src_col="doc1",
        dst_col="doc2",
    )
    neardup = (
        accepted.join(comp, accepted.doc_id == comp.node)
        .groupBy("cluster_id")
        .agg(F.min(accepted.doc_id).alias("doc_id"))
        .select("doc_id")
    )
    neardup = neardup.localCheckpoint()
    survd = docs.select("doc_id", "source").join(neardup, on="doc_id")

    # stage 3: per-source cap
    capped_docs = cap_per_group(
        survd, "source", cap=_E2E_CAP, seed=_E2E_CAP_SEED
    ).select("doc_id", "source")
    capped_docs = capped_docs.localCheckpoint()

    # stage 4: temperature mix (rates from the POST-CAP counts)
    mixed = temperature_sample(
        capped_docs,
        strata_col="source",
        alpha=0.5,
        id_col="doc_id",
        seed=_E2E_TEMP_SEED,
    ).select("doc_id", "source")
    mixed = mixed.localCheckpoint()

    # stage 5: split
    splitted = dataset_split(
        mixed, _SPLIT_FRACTIONS, id_col="doc_id", seed=_E2E_SPLIT_SEED
    ).select("doc_id", "source", "split")
    splitted = splitted.localCheckpoint()

    # stage 6: pack within split, doc_id order (mirrors _TOKS_SQL)
    ntok = docs.select(
        "doc_id",
        F.size(
            F.split(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                " ",
            )
        ).alias("n_tokens"),
    )
    packed = pack_sequences(
        splitted.join(ntok, on="doc_id").select(
            "doc_id", "source", "split", "n_tokens"
        ),
        budget=_E2E_BUDGET,
        token_col="n_tokens",
        order_col="doc_id",
        part_col="split",
    )
    # Every doc_id-grain survivor set is localCheckpointed at its
    # definition above (r14): each stage is materialized exactly once,
    # the attrition funnel's direct references and the successors'
    # lineage read the same blocks, and no stage's optimizer pass
    # re-carries the upstream chain (the r13 cache-marks form still
    # planned 191 exchanges for one gate). Nothing is cached, so there
    # is nothing to unpersist across calls. `sig` (the wide minhash
    # relation — the only big cache) is already dead: connected
    # components materialized the pair pipeline during its edge
    # checkpoint, and the component output carries no signature lineage.
    sig.unpersist(blocking=False)
    return {
        "docs": docs,
        "accepted": accepted,
        "neardup": neardup,
        "capped": capped_docs,
        "mixed": mixed,
        "splitted": splitted,
        "packed": packed,
    }


@query(
    "corpus_build_e2e",
    oracle=f"""
    WITH RECURSIVE
    {_E2E_CHAIN.strip()},
    splitted AS (
      SELECT doc_id, source,
             {_H60.format(expr=f"'{_E2E_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)")} AS split_key
      FROM mixed
    ),
    packable AS (
      SELECT s.doc_id, s.source, {_split_case_sql()} AS split,
             len(n.toks) AS n_tokens
      FROM splitted s JOIN norm n ON n.doc_id = s.doc_id
    ),
    cum AS (
      SELECT doc_id, source, split, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM packable
    )
    SELECT doc_id, source, split, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // {_E2E_BUDGET} AS pack_id,
           ROW_NUMBER() OVER (PARTITION BY split, (cum_tokens - n_tokens) // {_E2E_BUDGET}
                              ORDER BY doc_id) AS slot
    FROM cum
    """,
)
def corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus tier COMPOSED end to end — clean → near-dup CC →
    domain caps → temperature mix → split → pack — gated on the final
    packed output (one row per surviving doc with its split, pack_id and
    slot), with the oracle re-deriving the entire chain independently in
    one recursive-CTE DuckDB query. Every stage is an individually-gated
    operator; this gate is the proof they compose (stage N consumes
    stage N-1's survivors; the mixture rates come from the pipeline's
    own post-cap counts). See :func:`_e2e_stages` for stage semantics
    and the 100 TB plan shape."""
    return _e2e_stages(spark, sf_dir)["packed"]


@query(
    "corpus_build_attrition",
    oracle=f"""
    WITH RECURSIVE
    {_E2E_CHAIN.strip()}
    SELECT d.source,
           COUNT(*) AS n_in,
           CAST(SUM(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(SUM(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
           CAST(SUM(CASE WHEN cd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
           CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
           CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS retention_ppm
    FROM documents d
    LEFT JOIN accepted a ON a.doc_id = d.doc_id
    LEFT JOIN neardup nd ON nd.doc_id = d.doc_id
    LEFT JOIN capped_docs cd ON cd.doc_id = d.doc_id
    LEFT JOIN mixed m ON m.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def corpus_build_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e2e build's per-source attrition funnel — ingested → clean →
    near-dup survivor → capped → mixed, plus integer-exact end-to-end
    retention (ppm, floor division: no cross-engine float-rounding
    hazard). The datasheet table a 100 TB corpus build prints next to
    its packed output: a source whose crawl went bad shows up as a
    retention collapse at one specific tier. Same chain as
    :func:`corpus_build_e2e` (split/pack drop nothing, so the funnel
    ends at the mix tier)."""
    st = _e2e_stages(spark, sf_dir)

    def _flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("doc_id").withColumn(name, F.lit(1))

    j = (
        st["docs"]
        .select("doc_id", "source")
        .join(_flag(st["accepted"], "_a"), on="doc_id", how="left")
        .join(_flag(st["neardup"], "_n"), on="doc_id", how="left")
        .join(_flag(st["capped"], "_c"), on="doc_id", how="left")
        .join(_flag(st["mixed"], "_m"), on="doc_id", how="left")
    )
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.coalesce(F.col("_a"), F.lit(0))).alias("n_clean"),
        F.sum(F.coalesce(F.col("_n"), F.lit(0))).alias("n_neardup"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_capped"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_mixed"),
    )
    return agg.withColumn(
        "retention_ppm",
        F.expr("CAST(n_mixed * 1000000 DIV n_in AS BIGINT)"),
    )


# ---------------------------------------------------------------------------
# WebDataset tar-shard IO gates (r11 verdict ask #4 — the only r11 surface
# with no DuckDB gate). Both gates push REAL bytes through the tar path:
# the documents table is exported as WebDataset shards to a scratch
# directory, read back, and the read-back relation (not the source!) is
# what the gate emits — so a corruption anywhere in write framing, member
# pairing, or re-parse shows up as a value-hash mismatch against an
# oracle that only ever saw the parquet.
# ---------------------------------------------------------------------------
_WDS_SHARDS = 16
_WDS_RESHARD = 4


def _wds_scratch(sf_dir: str, tag: str) -> str:
    """Deterministic per-(sf, gate) scratch dir, recreated on every call
    so a previous run's shard files (possibly at a different shard
    count) can never leak into the read-back."""
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_wds_{os.path.basename(os.path.normpath(sf_dir))}_{tag}",
    )
    shutil.rmtree(base, ignore_errors=True)
    return base


def _docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import media_table

    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
            "payload"
        ),
    )
    return media_table(payload, "doc_id", "payload", "application/octet-stream")


@query(
    "webdataset_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(strlen(COALESCE(text, '')) AS BIGINT) AS n_bytes,
           md5(COALESCE(text, '')) AS payload_md5
    FROM documents
    """,
)
def webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full write→read identity through the tar path: every document's
    UTF-8 bytes exported as WebDataset shards (sources/webdataset.py),
    read back one-task-per-shard, and re-described as (doc_id, n_bytes,
    md5) — the oracle computes the same description straight from the
    parquet, so the gate passes only if the tar framing round-trips
    every byte of every doc. The export itself is byte-reproducible
    (fixed member mtimes, id-ordered members)."""
    from .sources.webdataset import read_tar_shards, write_tar_shards

    out = _wds_scratch(sf_dir, "roundtrip")
    write_tar_shards(_docs_as_media(spark, sf_dir), out, n_shards=_WDS_SHARDS)
    back = read_tar_shards(spark, out)
    return back.select(
        F.col("id").alias("doc_id"),
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@query(
    "webdataset_reshard_manifest",
    oracle=f"""
    SELECT CAST(doc_id % {_WDS_RESHARD} AS INTEGER) AS shard,
           COUNT(*) AS n_samples,
           CAST(SUM(strlen(COALESCE(text, ''))) AS BIGINT) AS sum_bytes,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    GROUP BY 1
    """,
)
def webdataset_reshard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshard identity ({_WDS_SHARDS}→{_WDS_RESHARD}): export at 16
    shards, read back, re-export the READ-BACK relation at 4, read THAT
    back, and emit the writer's manifest joined with per-shard
    aggregates (byte and id sums) of the final read-back — two full
    write/read generations between the parquet and the gate output.
    The oracle only groups the source table by the shard key."""
    from .sources.webdataset import (
        read_tar_shards,
        shard_manifest,
        write_tar_shards,
    )

    out1 = _wds_scratch(sf_dir, "reshard_a")
    write_tar_shards(_docs_as_media(spark, sf_dir), out1, n_shards=_WDS_SHARDS)
    gen1 = read_tar_shards(spark, out1)
    out2 = _wds_scratch(sf_dir, "reshard_b")
    write_tar_shards(gen1, out2, n_shards=_WDS_RESHARD)
    gen2 = read_tar_shards(spark, out2)
    agg = gen2.groupBy(
        F.pmod(F.col("id"), F.lit(_WDS_RESHARD)).cast("int").alias("shard")
    ).agg(
        F.sum(F.length("payload")).cast("bigint").alias("sum_bytes"),
        F.sum("id").cast("bigint").alias("sum_ids"),
    )
    man = shard_manifest(spark, out2).select(
        F.col("shard").cast("int").alias("shard"), "n_samples"
    )
    return man.join(agg, on="shard").select(
        "shard", "n_samples", "sum_bytes", "sum_ids"
    )


# ---------------------------------------------------------------------------
# rag_chunk_retrieval_topk — the RETRIEVAL-side composition twin of
# corpus_build_e2e: chunk the corpus into sliding windows
# (operators/corpus.chunk_long_docs — the RAG indexing unit), run BM25
# over the CHUNK relation (operators/retrieval.bm25_scores is
# relation-agnostic: id_col/text_col point at the chunk key/text), and
# rank PARENT documents by their best chunk (maxP document scoring —
# Dai & Callan, "Deeper Text Understanding for IR", SIGIR 2019). This is
# the retrieve-chunks-return-documents pattern every RAG pipeline runs;
# each stage is individually gated (doc_chunk_windows, doc_bm25_topk) —
# this gate pins that they compose over a DERIVED relation, not just the
# base table.
# (_RAG_DOC_K / _RAG_KEY_SPAN are defined at the top of this module,
# above the .queries import — see the import-cycle note there.)
# ---------------------------------------------------------------------------


@query(
    "rag_chunk_retrieval_topk",
    oracle=None,  # assembled below (needs the fragment imports)
)
def rag_chunk_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_RAG_DOC_K} parent documents per query under maxP chunk
    retrieval: 64-token/16-overlap chunk windows, BM25 over chunks
    (integer fixed-point scoring, broadcast queries), per-document max
    chunk score, deterministic tie-breaks (score desc, chunk_id asc /
    doc_id asc). Output: (query_id, doc_id, best_chunk_id,
    doc_score_units, doc_rank)."""
    from .operators.corpus import chunk_long_docs
    from .operators.retrieval import bm25_scores
    from .oracle_sql_fragments import _BM25_QUERIES
    from .queries_pipeline import _CHUNK_BUDGET, _CHUNK_OVERLAP

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_long_docs(
        docs, budget=_CHUNK_BUDGET, overlap=_CHUNK_OVERLAP
    ).select(
        (F.col("doc_id") * _RAG_KEY_SPAN + F.col("chunk_id")).alias(
            "chunk_key"
        ),
        F.col("doc_id").alias("parent"),
        "chunk_id",
        "chunk_text",
    )
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id long, term string")
    scores = bm25_scores(
        chunks, qdf, id_col="chunk_key", text_col="chunk_text"
    ).select("query_id", F.col("doc_id").alias("chunk_key"), "score_units")
    scored = scores.join(
        chunks.select("chunk_key", "parent", "chunk_id"), on="chunk_key"
    )
    w_best = Window.partitionBy("query_id", "parent").orderBy(
        F.col("score_units").desc(), F.col("chunk_id").asc()
    )
    per_doc = (
        scored.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.col("parent").alias("doc_id"),
            F.col("chunk_id").alias("best_chunk_id"),
            F.col("score_units").alias("doc_score_units"),
        )
    )
    w_doc = Window.partitionBy("query_id").orderBy(
        F.col("doc_score_units").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("doc_rank", F.row_number().over(w_doc))
        .filter(F.col("doc_rank") <= _RAG_DOC_K)
        .select(
            "query_id", "doc_id", "best_chunk_id", "doc_score_units",
            "doc_rank",
        )
    )


def _rag_oracle() -> str:
    from .oracle_sql_fragments import (
        _BM25_QUERIES,
        _bm25_score_ctes,
    )
    from .queries_llm import _TOKS_SQL
    from .queries_pipeline import _CHUNK_BUDGET, _CHUNK_STEP

    qrows = ", ".join(
        f"({qid}, '{term}', -1)" for qid, term in _BM25_QUERIES
    )
    return f"""
    WITH t0 AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n FROM documents
    ),
    cdef AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {_CHUNK_BUDGET} THEN 1
                  ELSE 1 + (n - {_CHUNK_BUDGET} + {_CHUNK_STEP} - 1) // {_CHUNK_STEP}
             END AS n_chunks
      FROM t0
    ),
    ck AS (
      SELECT doc_id * {_RAG_KEY_SPAN} + u.i AS chunk_key,
             doc_id AS parent, CAST(u.i AS INT) AS chunk_id,
             toks[u.i * {_CHUNK_STEP} + 1 : u.i * {_CHUNK_STEP} + {_CHUNK_BUDGET}] AS ctoks
      FROM cdef, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    ),
    toks AS (
      SELECT chunk_key AS doc_id, UNNEST(ctoks) AS term FROM ck
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
    q(query_id, term, self_excl) AS (VALUES {qrows}),
    {_bm25_score_ctes()},
    perdoc AS (
      SELECT s.query_id, c.parent AS doc_id, c.chunk_id, s.score_units,
             ROW_NUMBER() OVER (PARTITION BY s.query_id, c.parent
                                ORDER BY s.score_units DESC, c.chunk_id ASC)
               AS rn
      FROM scores s JOIN ck c ON c.chunk_key = s.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, chunk_id AS best_chunk_id,
             score_units AS doc_score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC)
               AS doc_rank
      FROM perdoc WHERE rn = 1
    )
    SELECT query_id, doc_id, best_chunk_id, doc_score_units, doc_rank
    FROM ranked WHERE doc_rank <= {_RAG_DOC_K}
    """


from .queries import _ORACLES as _oracle_registry  # noqa: E402

_oracle_registry["rag_chunk_retrieval_topk"] = _rag_oracle()


# ---------------------------------------------------------------------------
# multimodal_gif_phash_dedup — the BMP gate's construction over REAL
# LZW-COMPRESSED GIF89a files (operators/multimodal.py decode_gif /
# gif_bytes / _lzw_*): each document's 49-char normalized-text window is
# the 7×7 pixel grid of a genuine GIF (header + 256-entry palette +
# variable-width LZW sub-blocks), minted in an Arrow-batched stage
# (LZW needs Python — unlike BMP the pixel bytes are NOT stored
# verbatim), decoded back through the magic-dispatched real parser, then
# dHash → banded hamming. First gate whose media payloads exercise a
# real COMPRESSION path end to end; the oracle computes the identical
# pixel pipeline from the text directly (encode→decode identity is
# property-tested).
# ---------------------------------------------------------------------------
_GIF_SIDE = 7
_GIF_DIM = _GIF_SIDE * _GIF_SIDE
_GIF_MAXHAM = 6
_GIF_CAP = 50


@query(
    "multimodal_gif_phash_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             rpad(substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                             '\\s+', ' ', 'g')), 1, {_GIF_DIM}),
                  {_GIF_DIM}, 'x') AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 29) || '#' || substr(s, 31) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_GIF_DIM + 1})] AS f
      FROM items
    ),
    hashed AS (
      SELECT id,
             CAST(list_sum(
               [CASE WHEN f[i + 1] > f[i]
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, {_GIF_DIM})]
             ) AS BIGINT) AS h
      FROM feats
    ),
    bands AS (
      SELECT id, h, b.band,
             (h >> (b.band * 12)) & 4095 AS bits
      FROM hashed, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= {_GIF_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_GIF_MAXHAM}
    """,
)
def multimodal_gif_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (id1 < id2, hamming ≤ 6 over the 48-bit
    dHash) where every payload is a REAL LZW-compressed GIF89a minted
    from the text window and decoded by the real parser via magic-byte
    dispatch — the compressed-codec extension of the BMP gate."""
    from .operators.multimodal import (
        default_decoder,
        gif_bytes,
        media_dhash,
        media_table,
        phash_pairs,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.rpad(
            F.substring(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                1,
                _GIF_DIM,
            ),
            _GIF_DIM,
            "x",
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 29),
            F.lit("#"),
            F.substring(F.col("s"), 31, _GIF_DIM - 30),
        ).alias("s"),
    )

    def mint(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": [
                        gif_bytes(
                            s.encode("utf-8"), _GIF_SIDE, _GIF_SIDE
                        )
                        for s in pdf["s"]
                    ],
                }
            )

    items = orig.unionByName(pert).mapInPandas(
        mint, "id long, payload binary"
    )
    media = media_table(items, "id", "payload", "image/gif")
    hashes = media_dhash(media, decoder=default_decoder, dim=_GIF_DIM)
    return phash_pairs(
        hashes,
        max_hamming=_GIF_MAXHAM,
        dim=_GIF_DIM - 1,
        n_bands=4,
        max_bucket_size=_GIF_CAP,
    )


# ---------------------------------------------------------------------------
# multimodal_png_phash_dedup — the GIF gate's shape over REAL PNG files:
# stdlib-zlib DEFLATE plus OUR chunk walking and five-filter scanline
# unfiltering (operators/multimodal.py decode_png / png_bytes). Each
# payload is encoded with filter_type = id % 5, so the gate's decode
# path exercises EVERY unfilter branch (None/Sub/Up/Average/Paeth) on
# driver data, not just the trivial filter-0 case. Oracle unchanged
# (encode→decode identity, property-tested).
# ---------------------------------------------------------------------------
_PNG_SIDE = 7
_PNG_DIM = _PNG_SIDE * _PNG_SIDE
_PNG_MAXHAM = 6
_PNG_CAP = 50


@query(
    "multimodal_png_phash_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             rpad(substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                             '\\s+', ' ', 'g')), 1, {_PNG_DIM}),
                  {_PNG_DIM}, 'x') AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 29) || '#' || substr(s, 31) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_PNG_DIM + 1})] AS f
      FROM items
    ),
    hashed AS (
      SELECT id,
             CAST(list_sum(
               [CASE WHEN f[i + 1] > f[i]
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, {_PNG_DIM})]
             ) AS BIGINT) AS h
      FROM feats
    ),
    bands AS (
      SELECT id, h, b.band,
             (h >> (b.band * 12)) & 4095 AS bits
      FROM hashed, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= {_PNG_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_PNG_MAXHAM}
    """,
)
def multimodal_png_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs over REAL PNGs (DEFLATE-compressed,
    filter type rotated per id so all five unfilter branches execute),
    decoded by the native parser via magic-byte dispatch."""
    from .operators.multimodal import (
        default_decoder,
        media_dhash,
        media_table,
        phash_pairs,
        png_bytes,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.rpad(
            F.substring(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                1,
                _PNG_DIM,
            ),
            _PNG_DIM,
            "x",
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 29),
            F.lit("#"),
            F.substring(F.col("s"), 31, _PNG_DIM - 30),
        ).alias("s"),
    )

    def mint(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": [
                        png_bytes(
                            s.encode("utf-8"),
                            _PNG_SIDE,
                            _PNG_SIDE,
                            filter_type=int(i) % 5,
                        )
                        for i, s in zip(pdf["id"], pdf["s"])
                    ],
                }
            )

    items = orig.unionByName(pert).mapInPandas(
        mint, "id long, payload binary"
    )
    media = media_table(items, "id", "payload", "image/png")
    hashes = media_dhash(media, decoder=default_decoder, dim=_PNG_DIM)
    return phash_pairs(
        hashes,
        max_hamming=_PNG_MAXHAM,
        dim=_PNG_DIM - 1,
        n_bands=4,
        max_bucket_size=_PNG_CAP,
    )


# ---------------------------------------------------------------------------
# cdc_pgoutput_decode — the logical-replication WIRE FORMAT parsed for
# real (sources/pgoutput.py; S22/S24 narrowing): each shard of the
# events-derived change log is encoded into a genuine pgoutput frame
# stream (Relation + Begin + Insert/Update/Delete TupleData + Commit —
# the bytes a PostgreSQL logical slot emits, per the public protocol-v1
# spec) and decoded back by the from-scratch parser inside one
# applyInPandas stage. Updates carry an old-key 'K' tuple and deletes
# are key-only — so the decoder's REPLICA-IDENTITY branches execute on
# driver data. The oracle recomputes the decoded relation straight from
# events; any framing/cstring/length bug breaks the value hash.
#
# Distributed shape: shard = one replication connection (pgoutput
# guarantees Relation precedes tuples per connection), so each task
# keeps only its own relation cache — the same per-stream state a real
# consumer holds. Encode+decode are one Arrow-batched stage; no row
# UDFs, no driver collect.
# ---------------------------------------------------------------------------
_PGO_SHARDS = 8


@query(
    "cdc_pgoutput_decode",
    oracle=f"""
    WITH ch AS (
      SELECT CAST(event_id % {_PGO_SHARDS} AS INTEGER) AS shard,
             event_id, user_id, event_type, value,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'update' END AS op
      FROM events
    )
    SELECT shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY event_id) - 1
                AS BIGINT) AS seq,
           'public.events' AS table_name,
           op,
           CAST(user_id AS BIGINT) AS user_id,
           CASE WHEN op = 'delete' THEN NULL ELSE event_type END AS event_type,
           CASE WHEN op = 'delete' THEN NULL ELSE value END AS value
    FROM ch
    """,
)
def cdc_pgoutput_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change rows recovered from REAL pgoutput byte streams: the
    events-derived log is framed per shard (insert/update/delete ops,
    old-key tuples on updates, key-only deletes), then parsed back by
    the native decoder — (shard, seq, table_name, op, user_id,
    event_type, value), seq being the within-stream arrival order a
    consumer applies."""
    from .sources.pgoutput import PgOutputEncoder, decode_pgoutput_stream

    events = load_table(spark, sf_dir, "events")
    src = events.select(
        F.pmod(F.col("event_id"), F.lit(_PGO_SHARDS)).cast("int").alias(
            "shard"
        ),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )

    def encode_decode(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("event_id")
        shard = int(pdf["shard"].iloc[0])
        enc = PgOutputEncoder(
            relid=16385 + shard,
            namespace="public",
            relname="events",
            columns=["user_id", "event_type", "value"],
            key_cols=["user_id"],
        )
        enc.relation().begin(xid=1000 + shard)
        # itertuples, not iterrows: iterrows materializes a pandas Series
        # per row (~10x the per-row overhead) and this loop IS the gate's
        # per-row cost — the wire codec itself is plain bytes work
        for r in pdf.itertuples(index=False):
            uid = str(int(r.user_id))
            val = (
                None
                if r.value is None
                or (isinstance(r.value, float) and math.isnan(r.value))
                else repr(float(r.value))
            )
            if r.event_type == "signup":
                enc.insert([uid, r.event_type, val])
            elif r.event_type == "purchase":
                enc.delete([uid, None, None])
            else:
                enc.update(
                    [uid, r.event_type, val], old_key=[uid, None, None]
                )
        enc.commit()
        rows = decode_pgoutput_stream(enc.stream())
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "seq": r["seq"],
                    "table_name": r["table"],
                    "op": r["op"],
                    "user_id": int(r["columns"]["user_id"]),
                    "event_type": r["columns"]["event_type"],
                    "value": (
                        float(r["columns"]["value"])
                        if r["columns"]["value"] is not None
                        else None
                    ),
                }
                for r in rows
            ]
        )

    return src.groupBy("shard").applyInPandas(
        encode_decode,
        "shard int, seq long, table_name string, op string, "
        "user_id long, event_type string, value double",
    )


# ---------------------------------------------------------------------------
# multimodal_mp4_probe — native ISO-BMFF container probing
# (operators/multimodal.py probe_mp4 / mp4_skeleton): each document
# mints a structurally-valid MP4 skeleton (ftyp + moov/mvhd/trak/tkhd/
# hdlr + mdat) from a deterministic per-doc parameter formula, and the
# probe walks the real box tree to recover duration/dimensions/track
# inventory — the metadata a video-curation pipeline plans with (frame
# budgets, resize targets, audio routing) WITHOUT decoding a frame.
# Frame decode stays the declared codec seam; the container does not.
# The oracle recomputes the parameters from the same formula.
# ---------------------------------------------------------------------------


@query(
    "multimodal_mp4_probe",
    oracle="""
    SELECT doc_id,
           'isom' AS brand,
           CAST(1000 + (doc_id * 37) % 600000 AS BIGINT) AS duration_ms,
           CAST(16 * (1 + doc_id % 120) AS INTEGER) AS width,
           CAST(16 * (1 + doc_id % 68) AS INTEGER) AS height,
           1 AS n_video_tracks,
           CAST(doc_id % 3 AS INTEGER) AS n_audio_tracks
    FROM documents
    """,
)
def multimodal_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container metadata recovered by walking REAL MP4 box trees:
    (doc_id, brand, duration_ms, width, height, n_video_tracks,
    n_audio_tracks), every value read back out of minted ISO-BMFF bytes
    by the native probe."""
    from .operators.multimodal import mp4_skeleton, probe_mp4

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def mint_probe(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                payload = mp4_skeleton(
                    duration_ms=1000 + (d * 37) % 600000,
                    width=16 * (1 + d % 120),
                    height=16 * (1 + d % 68),
                    n_audio_tracks=d % 3,
                )
                m = probe_mp4(payload)
                rows.append({"doc_id": d, **m})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        mint_probe,
        "doc_id long, brand string, duration_ms long, width int, "
        "height int, n_video_tracks int, n_audio_tracks int",
    )


# ---------------------------------------------------------------------------
# dedup_containment_pairs — asymmetric near-dup detection
# (operators/dedup.containment_pairs): containment = inter/min(|A|,|B|)
# catches a short doc quoted inside a long one, which Jaccard ≈ |A|/|B|
# structurally misses at the symmetric tier's 0.2 threshold (Broder
# 1997). Candidates come from the PREFIX-FILTERED postings join
# (postings_candidates, r13: complete for the containment threshold,
# hot-shingle-safe — the LSH family's collision probability tracks
# Jaccard, so it under-recalls exactly the pairs this gate exists for);
# the verifier intersects FULL shingle sets pair-locally, so the oracle
# (a plain co-occurrence join) stays value-identical. Integer-exact
# output — the permille ratio and the threshold inequality never round
# a double.
# ---------------------------------------------------------------------------
_CONT_THRESHOLD = 0.6


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE.strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) >= 2
    ),
    j AS (SELECT sh.* FROM sh JOIN shared USING (shingle)),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM j a JOIN j b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT co.doc1, co.doc2, co.inter,
           s1.n AS n1, s2.n AS n2,
           CAST(co.inter * 1000 // least(s1.n, s2.n) AS BIGINT)
             AS containment_permille
    FROM co
    JOIN sizes s1 ON s1.doc_id = co.doc1
    JOIN sizes s2 ON s2.doc_id = co.doc2
    WHERE co.inter * 1000 >= {int(_CONT_THRESHOLD * 1000)} * least(s1.n, s2.n)
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with shingle containment ≥ {_CONT_THRESHOLD} (doc1 < doc2,
    integer-exact permille): prefix-filtered postings candidates
    (complete for the threshold, hot-shingle-safe) verified by exact
    pair-local full-set intersection — the excerpt/quote detector the
    symmetric Jaccard tier cannot be."""
    from .operators.dedup import (
        containment_pairs,
        doc_shingles,
        postings_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    # checkpointed: the shingle relation feeds dfreq, sizes,
    # posts/prefix AND the verifier's semi-join — one explode instead
    # of ~5 (same r13 measurement as dedup_containment_capped)
    sh = doc_shingles(docs).localCheckpoint()
    cand = postings_candidates(sh, threshold=_CONT_THRESHOLD)
    return containment_pairs(
        sh, candidates=cand, threshold=_CONT_THRESHOLD
    ).select("doc1", "doc2", "inter", "n1", "n2", "containment_permille")
