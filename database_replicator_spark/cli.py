"""Thin CLI over the engine facade — the reference's command names
(src/main.rs:48-237: validate / init / sync / status / verify) for
parquet-directory sources and targets.

Usage:
  python -m database_replicator_spark.cli validate --source DIR --target DIR
  python -m database_replicator_spark.cli init     --source DIR --target DIR
             [--table-filter "t:pred"] [--exclude-table db.t] [--schema-only t]
  python -m database_replicator_spark.cli sync     --source DIR --target DIR
             --table T --watermark-col C --pk C [--once]
  python -m database_replicator_spark.cli verify   --source DIR --target DIR
  python -m database_replicator_spark.cli status   --target DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_sources(spark, source: str):
    """Source routing (the reference's URL/path sniffing, src/lib.rs:65-86):
    a .db/.sqlite file ingests through the document pipeline; a directory
    loads its parquet tables."""
    if source.endswith((".db", ".sqlite", ".sqlite3")):
        from .sources.sqlite_source import ingest_sqlite

        return ingest_sqlite(spark, source)
    df = {}
    for name in sorted(os.listdir(source)):
        if name.endswith(".parquet"):
            from .sources.catalog import load_table

            df[name[: -len(".parquet")]] = load_table(spark, source, name[: -len(".parquet")])
        elif name.endswith((".csv", ".orc")):
            # CSV/ORC table drops (warehouse handoffs) next to parquet:
            # read via the schema-sidecar reader; corrupt CSV rows are
            # split off so downstream tables stay typed
            from .sources.files import read_table, split_corrupt

            tbl, _, ext = name.rpartition(".")
            loaded = read_table(spark, os.path.join(source, name))
            if ext == "csv":
                loaded, _bad = split_corrupt(loaded)
            df[tbl] = loaded
    return df


def _get_session():
    """Reuse an already-active session (embedded use / tests) and report
    whether we own it — getOrCreate returns the shared JVM session, and
    stopping a session we did not create would kill the embedder's."""
    from pyspark.sql import SparkSession

    from .session import build_session

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    return build_session("drs-cli"), True


def _build_engine(args):
    from .engine import Engine, ParquetTarget
    from .plans.rules import ReplicationFilter

    spark, owns = _get_session()
    if getattr(args, "config", None):
        # reference-format TOML config (src/config.rs); flags stack on top
        from .plans.rules import load_rules_config

        filt = load_rules_config(args.config)
        filt.exclude_tables.extend(args.exclude_table or [])
    else:
        filt = ReplicationFilter(
            exclude_tables=[t for t in (args.exclude_table or [])],
        )
    for spec in args.table_filter or []:
        table, _, pred = spec.partition(":")
        filt.rules.add_predicate(table, pred)
    for t in args.schema_only or []:
        filt.rules.add_schema_only(t)
    eng = Engine(
        spark=spark,
        source_tables=_load_sources(spark, args.source),
        target=ParquetTarget(args.target),
        filter=filt,
    )
    return spark, owns, eng


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="database_replicator_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, target_only: bool = False):
        if not target_only:
            sp.add_argument("--source", required=True)
        sp.add_argument("--target", required=True)
        sp.add_argument("--table-filter", action="append", metavar="TABLE:PRED")
        sp.add_argument("--exclude-table", action="append", metavar="DB.TABLE")
        sp.add_argument("--schema-only", action="append", metavar="TABLE")
        sp.add_argument("--config", default=None, metavar="TOML",
                        help="reference-format TOML replication config "
                        "(databases.<db>.schema_only/table_filters/"
                        "time_filters); flags stack on top")

    common(sub.add_parser("validate", help="preflight checks"))
    init_p = sub.add_parser("init", help="snapshot copy")
    common(init_p)
    init_p.add_argument("--checkpoint", help="checkpoint file for resume")
    sync_p = sub.add_parser("sync", help="watermark incremental sync")
    common(sync_p)
    sync_p.add_argument("--table", required=True)
    sync_p.add_argument("--watermark-col", required=True)
    sync_p.add_argument("--pk", required=True, action="append")
    sync_p.add_argument(
        "--once", action="store_true",
        help="run a single sync cycle and exit (default: loop at --interval)",
    )
    sync_p.add_argument(
        "--interval", type=float, default=3600.0,
        help="daemon sync interval in seconds (reference default 3600)",
    )
    sync_p.add_argument("--reconcile", action="store_true")
    common(sub.add_parser("verify", help="checksum comparison"))
    common(sub.add_parser("drift", help="schema-drift report with safe/review ALTERs"))
    status_p = sub.add_parser("status", help="sync state report")
    status_p.add_argument("--target", required=True)
    repl_p = sub.add_parser(
        "replication-plan",
        help="emit the CREATE PUBLICATION/SUBSCRIPTION statement plan (S24)",
    )
    repl_p.add_argument("--publication", required=True)
    repl_p.add_argument("--subscription", required=True)
    repl_p.add_argument("--source-conn", required=True, metavar="CONNSTR")
    repl_p.add_argument("--db-name", default="")
    repl_p.add_argument(
        "--server-version", type=int, help="source server_version_num (PG15 gate)"
    )
    repl_p.add_argument(
        "--publish-table", action="append", metavar="SCHEMA.TABLE",
        help="catalog listing for a filtered publication (repeatable)",
    )
    repl_p.add_argument("--table-filter", action="append", metavar="TABLE:PRED")
    repl_p.add_argument("--exclude-table", action="append", metavar="DB.TABLE")
    repl_p.add_argument("--schema-only", action="append", metavar="TABLE")

    profile_p = sub.add_parser(
        "profile", help="per-column data profile of every table in a parquet dir"
    )
    profile_p.add_argument("--source", required=True)
    profile_p.add_argument("--table", action="append", help="restrict to table(s)")
    profile_p.add_argument(
        "--approximate", action="store_true",
        help="HLL distinct counts (~2%% error) instead of exact — drops "
        "the Expand multiplier, the 100 TB mode",
    )
    profile_p.add_argument(
        "--percentiles", action="store_true",
        help="add p50/p90/p99 per numeric column via the mergeable KLL "
        "sketch (no global sort; exact below sketch capacity)",
    )
    profile_p.add_argument(
        "--from-maintained", metavar="DIR",
        help="serve the profile from a streaming-maintained store "
        "(streaming/profile_ingest.py) instead of scanning --source: "
        "per-epoch KLL/KMV/summary partials merged on read — no rescan "
        "of history; --source is ignored",
    )

    corpus_p = sub.add_parser(
        "corpus-build",
        help="batch corpus build: ingest → quality → dedup → mix → split → pack → shard",
    )
    corpus_p.add_argument("--source", required=True, metavar="JSONL_OR_PARQUET_DIR")
    corpus_p.add_argument("--out", required=True)
    corpus_p.add_argument("--budget", type=int, default=1024)
    corpus_p.add_argument("--shards", type=int, default=8)
    corpus_p.add_argument(
        "--temperature", type=float, default=None,
        help="mixture alpha (e.g. 0.5); omit to keep the raw source mix",
    )
    corpus_p.add_argument("--seed", type=int, default=0)
    corpus_p.add_argument("--min-tokens", type=int, default=10)
    corpus_p.add_argument(
        "--near-dup", action="store_true",
        help="add LSH + verified-Jaccard cluster dedup after exact dedup",
    )
    corpus_p.add_argument(
        "--span-mask", action="store_true",
        help="remove cross-document duplicated 8-gram spans from surviving docs",
    )
    corpus_p.add_argument(
        "--chunk-dedup", action="store_true",
        help="drop repeated 20-word chunks WITHIN each doc (templated-page "
        "boilerplate), after cross-document span masking",
    )
    corpus_p.add_argument(
        "--semantic-dedup", action="store_true",
        help="cluster-dedup paraphrase-level duplicates via feature-hashed "
        "embeddings + LSH (no external encoder needed)",
    )
    corpus_p.add_argument(
        "--semantic-threshold", type=float, default=0.85,
        help="cosine threshold for the semantic dedup tier",
    )
    corpus_p.add_argument(
        "--token-budget", type=int, default=None,
        help="best-first selection to this total token target before splitting",
    )
    corpus_p.add_argument(
        "--classifier-threshold", type=float, default=None,
        help="keep only docs whose hashed-feature linear-classifier score "
        "is >= this value (model-based quality gate after the rule cascade)",
    )
    corpus_p.add_argument(
        "--datasheet", action="store_true",
        help="also write datasheet.json (the data card) over the BUILT corpus",
    )
    corpus_p.add_argument(
        "--prefer-source", action="append", metavar="SOURCE=RANK",
        help="near-dup cluster survivor preference: lower rank wins "
        "(e.g. --prefer-source curated=0 --prefer-source crawl=1); "
        "unranked sources lose to any ranked one",
    )
    corpus_p.add_argument(
        "--export-jsonl", action="store_true",
        help="also write gzipped JSON-lines shards + manifest.json "
        "(the training-loader format) next to the parquet corpus",
    )

    datasheet_p = sub.add_parser(
        "datasheet",
        help="corpus data card: size, composition, lengths, dup + quality rates",
    )
    datasheet_p.add_argument("--source", required=True, metavar="PARQUET_DIR")
    datasheet_p.add_argument(
        "--embeddings", action="store_true",
        help="include embedding-table stats (dims, norm distribution, "
        "degenerate-vector count, per-label counts)",
    )
    datasheet_p.add_argument(
        "--approximate", action="store_true",
        help="sketch/approx paths for percentiles and distinct counts "
        "(the 100 TB mode; exact is fine through ~1e9 docs)",
    )

    explain_p = sub.add_parser(
        "explain",
        help="formatted physical plan of a named gate query (plan review "
        "without running it)",
    )
    explain_p.add_argument("--query", required=True, metavar="GATE_NAME")
    explain_p.add_argument("--source", default="/root/testdata/sf0.001")
    explain_p.add_argument(
        "--mode", default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    restore_p = sub.add_parser(
        "restore",
        help="materialize a source directory into a LIVE database over a "
        "DBAPI DSN (a .db/.sqlite file path in this sandbox; postgres:// "
        "in prod): CREATE TABLE from the Spark schema, then distributed "
        "idempotent ON CONFLICT upserts",
    )
    restore_p.add_argument("--source", required=True)
    restore_p.add_argument("--dsn", required=True, metavar="/path/target.db")
    restore_p.add_argument("--table", action="append",
                           help="restrict to table(s); default: all")
    restore_p.add_argument(
        "--pk", action="append", default=[], metavar="TABLE=COL[,COL]",
        help="declared primary key per table; tables without one upsert "
        "on ALL columns (insert-if-absent, still idempotent)",
    )
    restore_p.add_argument(
        "--edge", action="append", default=[], metavar="CHILD=PARENT",
        help="FK edge for restore ordering (repeatable): parents load in "
        "earlier stages, like the reference's FK-ordered restore",
    )

    ret_p = sub.add_parser(
        "retrieve",
        help="Ranked lexical/hybrid retrieval over a documents table: "
        "bm25, ql (query-likelihood, Dirichlet), jm (query-likelihood, "
        "Jelinek-Mercer), tfidf (cosine VSM), or hybrid (integer RRF "
        "of bm25+ql, plus dense cosine for query-by-example with "
        "--with-dense; --weights skews the fusion)",
    )
    ret_p.add_argument("--source", required=True)
    ret_p.add_argument("--table", default="documents")
    ret_p.add_argument(
        "--query", action="append", default=[],
        help="free-text query (repeatable; query_id = position)",
    )
    ret_p.add_argument(
        "--query-doc-ids", default=None,
        help="comma-separated doc_ids for query-by-example (the doc's "
        "own terms are the query; the doc itself is excluded)",
    )
    ret_p.add_argument("--k", type=int, default=10)
    ret_p.add_argument(
        "--method", default="bm25",
        choices=["bm25", "ql", "jm", "tfidf", "prf", "hybrid"],
    )
    ret_p.add_argument("--k1", type=float, default=1.2)
    ret_p.add_argument("--b", type=float, default=0.75)
    ret_p.add_argument("--mu", type=float, default=100.0)
    ret_p.add_argument("--lam", type=float, default=0.5,
                       help="Jelinek-Mercer interpolation weight")
    ret_p.add_argument("--fb-k", type=int, default=5,
                       help="prf: feedback depth (pass-1 top docs)")
    ret_p.add_argument("--fb-terms", type=int, default=3,
                       help="prf: expansion terms added per query")
    ret_p.add_argument(
        "--weights", default=None,
        help="hybrid only: comma-separated INTEGER weights, one per "
        "fused ranker in order (bm25, ql[, dense]) — e.g. 2,1 trusts "
        "the lexical ranker double",
    )
    ret_p.add_argument(
        "--with-dense", action="store_true",
        help="hybrid only, query-by-example only: add the exact dense "
        "cosine ranker over the embeddings table (shared id space)",
    )
    ret_p.add_argument("--embeddings-table", default="embeddings")

    pr_p = sub.add_parser(
        "pagerank",
        help="Integer fixed-point PageRank centrality over the part "
        "co-purchase graph (parts co-occurring in an order); --seeds "
        "switches to personalized PageRank ('more parts like these')",
    )
    pr_p.add_argument("--source", required=True)
    pr_p.add_argument("--iters", type=int, default=3)
    pr_p.add_argument("--top", type=int, default=20)
    pr_p.add_argument(
        "--seeds", default=None,
        help="comma-separated part keys for personalized teleport",
    )
    pr_p.add_argument(
        "--weighted", action="store_true",
        help="weight edges by shared-order count (mass splits "
        "proportionally to association strength)",
    )

    hits_p = sub.add_parser(
        "hits",
        help="Integer HITS hubs/authorities over the bipartite "
        "customer->supplier purchase graph (Kleinberg): authoritative "
        "suppliers vs hub customers",
    )
    hits_p.add_argument("--source", required=True)
    hits_p.add_argument("--iters", type=int, default=2)
    hits_p.add_argument("--top", type=int, default=20)

    ann_p = sub.add_parser(
        "ann",
        help="ANN top-k over an embeddings table: exact, lsh, ivf, pq, "
        "or ivfpq; query rows picked by --query-ids",
    )
    ann_p.add_argument("--source", required=True)
    ann_p.add_argument("--table", default="embeddings")
    ann_p.add_argument("--query-ids", required=True,
                       help="comma-separated vec_ids to use as queries")
    ann_p.add_argument("--k", type=int, default=10)
    ann_p.add_argument(
        "--method", default="exact",
        choices=["exact", "lsh", "ivf", "pq", "ivfpq"],
    )
    ann_p.add_argument("--nlist", type=int, default=16)
    ann_p.add_argument("--nprobe", type=int, default=2)
    ann_p.add_argument("--m", type=int, default=8)
    ann_p.add_argument("--ksub", type=int, default=32)
    ann_p.add_argument("--rerank", type=int, default=0)
    ann_p.add_argument("--planes", type=int, default=6)
    ann_p.add_argument("--tables", type=int, default=4)
    ann_p.add_argument("--multiprobe", type=int, default=1)
    ann_p.add_argument(
        "--quantizer", default="kmeans", choices=["kmeans", "sample"],
        help="trained (kmeans) or deterministic lowest-id sample quantizer",
    )

    semdedup_p = sub.add_parser(
        "semdedup",
        help="SemDeDup semantic dedup over an embeddings table: "
        "cluster-bounded within-cell cosine prune, keep-lowest-id "
        "(Abbas 2023)",
    )
    semdedup_p.add_argument("--source", required=True)
    semdedup_p.add_argument("--table", default="embeddings")
    semdedup_p.add_argument(
        "--tau", type=float, default=0.95,
        help="rounded-cosine duplicate threshold within a cell",
    )
    semdedup_p.add_argument(
        "--nlist", type=int, default=16,
        help="quantizer cells — scale with corpus size so cells stay "
        "task-sized (per-cell work is |cell|^2)",
    )
    semdedup_p.add_argument(
        "--quantizer", default="kmeans", choices=["kmeans", "sample"],
    )
    semdedup_p.add_argument(
        "--out", help="optional parquet path for the labeled table "
        "(vec_id, cid, dup_of, kept)",
    )

    cingest_p = sub.add_parser(
        "corpus-ingest",
        help="streaming corpus ingestion: drain a JSONL document queue "
        "through the acceptance gauntlet (quality → exact dedup → "
        "optional LSH near-dup) into idempotent epoch partitions",
    )
    cingest_p.add_argument("--source", required=True, metavar="QUEUE_DIR")
    cingest_p.add_argument("--target", required=True)
    cingest_p.add_argument("--checkpoint", required=True)
    cingest_p.add_argument("--near-dup", action="store_true")
    cingest_p.add_argument(
        "--verify-jaccard", type=float, default=None,
        help="upgrade near-dup rejection to verified Jaccard >= this",
    )
    cingest_p.add_argument(
        "--follow", action="store_true",
        help="keep polling (default: drain available input and stop)",
    )
    cingest_p.add_argument(
        "--maintain-term-stats", action="store_true",
        help="also append each epoch's (doc,term,tf)/(doc,dl) retrieval "
        "index partitions, so `retrieve` serves fresh docs without a "
        "full re-index",
    )

    eingest_p = sub.add_parser(
        "embed-ingest",
        help="streaming embedding-index ingestion: id dedup + LSH/exact "
        "near-dup rejection into idempotent epoch partitions",
    )
    eingest_p.add_argument("--source", required=True, metavar="PARQUET_QUEUE_DIR")
    eingest_p.add_argument("--target", required=True)
    eingest_p.add_argument("--checkpoint", required=True)
    eingest_p.add_argument("--dim", type=int, required=True)
    eingest_p.add_argument("--threshold", type=float, default=0.92)
    eingest_p.add_argument(
        "--pq", action="store_true",
        help="store PQ codes in the bucket index (ADC prescreen + exact rerank)",
    )
    eingest_p.add_argument("--follow", action="store_true")

    gingest_p = sub.add_parser(
        "graph-ingest",
        help="streaming graph maintenance: drain a JSONL edge queue "
        "(src,dst,w) into the per-epoch delta store; re-rank (PageRank) "
        "when pending delta mass crosses the threshold",
    )
    gingest_p.add_argument("--source", required=True, metavar="QUEUE_DIR")
    gingest_p.add_argument("--target", required=True)
    gingest_p.add_argument("--checkpoint", required=True)
    gingest_p.add_argument(
        "--rerank-fraction", type=float, default=0.05,
        help="refresh ranks when pending Σw / ranked Σw reaches this "
        "(0 = every epoch)",
    )
    gingest_p.add_argument("--iters", type=int, default=3)
    gingest_p.add_argument(
        "--unit", type=int, default=10**9,
        help="fixed-point unit for pagerank_units (the overflow guard "
        "prescribes a lower unit for bigger graphs)",
    )
    gingest_p.add_argument("--follow", action="store_true")

    gstatus_p = sub.add_parser(
        "graph-status",
        help="staleness report for a graph-ingest target: ranked "
        "watermark, pending delta mass/fraction, epochs behind",
    )
    gstatus_p.add_argument("--target", required=True)

    mdedup_p = sub.add_parser(
        "media-dedup",
        help="perceptual-hash media dedup over a (id, payload) parquet "
        "table: hash → banded hamming candidates → connected components "
        "→ canonical per cluster",
    )
    mdedup_p.add_argument("--source", required=True)
    mdedup_p.add_argument("--table", required=True)
    mdedup_p.add_argument("--id-col", default="id")
    mdedup_p.add_argument("--payload-col", default="payload")
    mdedup_p.add_argument(
        "--hash", default="dhash", choices=["ahash", "dhash", "dct"],
    )
    mdedup_p.add_argument("--max-hamming", type=int, default=6)
    mdedup_p.add_argument("--out", help="write labeled parquet here")

    wds_p = sub.add_parser(
        "wds-export",
        help="export a (id, payload) parquet table as WebDataset-style "
        "tar shards ({id}.{ext} + {id}.json members, deterministic "
        "bytes) — the multimodal training-corpus packaging",
    )
    wds_p.add_argument("--source", required=True)
    wds_p.add_argument("--table", required=True)
    wds_p.add_argument("--out", required=True)
    wds_p.add_argument("--id-col", default="id")
    wds_p.add_argument("--payload-col", default="payload")
    wds_p.add_argument("--mime", default="application/octet-stream")
    wds_p.add_argument("--shards", type=int, default=8)

    drift_p = sub.add_parser(
        "drift-report",
        help="per-epoch payload schema drift from a change-apply target "
        "(requires the applier to have run with expected schemas)",
    )
    drift_p.add_argument("--target", required=True)
    drift_p.add_argument(
        "--drifted-only", action="store_true",
        help="only epochs/tables that actually drifted",
    )

    istatus_p = sub.add_parser(
        "ingest-status",
        help="per-tier ingest monitoring: roll up the per-epoch "
        "rows-in / rejected-per-tier / seconds counters a corpus-ingest "
        "or embed-ingest target has accumulated (the ST7 lag report for "
        "the ingest paths)",
    )
    istatus_p.add_argument("--target", required=True)

    sql_p = sub.add_parser(
        "sql",
        help="run ad-hoc SQL over a source directory (every table "
        "registered as a view; SELECT-only unless --out writes parquet)",
    )
    sql_p.add_argument("--source", required=True)
    sql_p.add_argument("--query", default=None, metavar="SQL",
                       help="statement to run (required unless "
                       "--interactive)")
    sql_p.add_argument("--out", default=None,
                       help="write the full result as parquet here instead "
                       "of printing rows")
    sql_p.add_argument("--limit", type=int, default=100,
                       help="max rows printed in the JSON output (ignored "
                       "with --out)")
    sql_p.add_argument("--interactive", action="store_true",
                       help="REPL mode: read ';'-terminated statements "
                       "from stdin, print one JSON result line each "
                       "(the reference's interactive console surface — "
                       "src/interactive.rs — as a pipe-friendly loop)")

    diff_p = sub.add_parser(
        "diff",
        help="row-level divergence report between source and target tables "
        "(missing_in_target / extra_in_target / mismatch per pk)",
    )
    diff_p.add_argument("--source", required=True)
    diff_p.add_argument("--target", required=True)
    diff_p.add_argument("--table", required=True)
    diff_p.add_argument("--pk", required=True, action="append")
    diff_p.add_argument("--limit", type=int, default=20,
                        help="sample size in the JSON output")

    sample_p = sub.add_parser(
        "sample",
        help="FK-consistent fixture sample: hash-draw root keys, follow "
        "foreign keys, write the sampled tables (zero orphans)",
    )
    sample_p.add_argument("--source", required=True)
    sample_p.add_argument("--target", required=True)
    sample_p.add_argument("--root", required=True, metavar="TABLE")
    sample_p.add_argument("--root-key", required=True, metavar="COL")
    sample_p.add_argument(
        "--edge", action="append", default=[],
        metavar="CHILD.FKCOL=PARENT.KEYCOL",
        help="FK edge, topological order (e.g. orders.o_custkey=customer.c_custkey)",
    )
    sample_p.add_argument("--rate", type=float, required=True)
    sample_p.add_argument("--seed", type=int, default=1)

    optimize_p = sub.add_parser(
        "optimize",
        help="small-file compaction of a parquet dir (lakehouse OPTIMIZE): "
        "rewrite into target-sized files, optionally restoring sort keys",
    )
    optimize_p.add_argument("--path", required=True)
    optimize_p.add_argument("--target-file-mb", type=int, default=128)
    optimize_p.add_argument(
        "--sort-col", action="append",
        help="restore clustering on these columns (repeatable) — a bare "
        "repartition destroys min/max pruning order",
    )

    compact_p = sub.add_parser(
        "compact",
        help="CDC maintenance: rewrite the per-epoch change log into one "
        "deduplicated partition (stop the stream around it)",
    )
    compact_p.add_argument("--target", required=True)
    compact_p.add_argument(
        "--ingest-indexes", action="store_true",
        help="also compact the corpus-ingest fingerprint/signature indexes",
    )

    asof_p = sub.add_parser(
        "asof",
        help="CDC time travel: reconstruct a table AS OF the end of an epoch",
    )
    asof_p.add_argument("--target", required=True)
    asof_p.add_argument("--table", required=True)
    asof_p.add_argument("--epoch", type=int, required=True)
    asof_p.add_argument(
        "--out", help="write the reconstruction to this parquet dir "
        "(default: print row count + sample only)",
    )

    audit_p = sub.add_parser(
        "audit", help="declarative constraint audit of a parquet table"
    )
    audit_p.add_argument("--source", required=True, metavar="PARQUET_DIR")
    audit_p.add_argument("--table", required=True)
    audit_p.add_argument("--unique", action="append", help="column that must be unique")
    audit_p.add_argument("--not-null", action="append", help="column that must be non-null")
    audit_p.add_argument(
        "--check", action="append", metavar="NAME:PREDICATE",
        help="named SQL predicate every row must satisfy",
    )
    audit_p.add_argument(
        "--fk", action="append", metavar="CHILDCOL:PARENT_TABLE.PARENTCOL",
        help="referential check against another table in the same dir",
    )
    audit_p.add_argument(
        "--fail-on-violation", action="store_true",
        help="exit 1 when any constraint has violations (CI gate mode)",
    )

    rollup_p = sub.add_parser(
        "rollup",
        help="incrementally maintained aggregate: stored mergeable partials",
    )
    rollup_p.add_argument("--source", required=True, metavar="PARQUET_DIR")
    rollup_p.add_argument("--table", required=True)
    rollup_p.add_argument("--keys", required=True, help="comma-separated group cols")
    rollup_p.add_argument("--measures", required=True, help="comma-separated measure cols")
    rollup_p.add_argument("--state", required=True, help="partial-aggregate store dir")
    rollup_p.add_argument(
        "--filter", default=None, help="SQL predicate selecting the slice to fold in"
    )
    rollup_p.add_argument(
        "--delta", action="store_true",
        help="merge the slice into existing state (default: rebuild state)",
    )

    args = p.parse_args(argv)

    if args.command == "profile":
        from .operators.estimation import profile_table

        spark, owns = _get_session()
        try:
            if args.from_maintained:
                from .streaming.profile_ingest import read_profile

                rows = [
                    r.asDict()
                    for r in read_profile(spark, args.from_maintained).collect()
                ]
                print(json.dumps(
                    {"ok": True, "maintained": args.from_maintained,
                     "profile": rows},
                    default=str,
                ))
                return 0
            tables = _load_sources(spark, args.source)
            if args.table:
                tables = {t: df for t, df in tables.items() if t in set(args.table)}
            out = {
                t: [
                    r.asDict()
                    for r in profile_table(
                        df, approximate=args.approximate
                    ).collect()
                ]
                for t, df in tables.items()
            }
            result = {"ok": True, "profiles": out}
            if args.percentiles:
                from .operators.estimation import profile_percentiles

                pct = {}
                for t, df in tables.items():
                    try:
                        pct[t] = [
                            r.asDict()
                            for r in profile_percentiles(df).collect()
                        ]
                    except ValueError:
                        pct[t] = []  # no numeric columns
                result["percentiles"] = pct
            print(json.dumps(result, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "restore":
        from pyspark.sql import functions as _F
        from pyspark.sql import types as _T

        from .operators.ddl import create_table_sql
        from .sources.ddl_exec import execute_ddl
        from .sources.jdbc import JdbcUpsertWriter, open_dbapi

        spark, owns = _get_session()
        try:
            pks = {}
            for spec in args.pk:
                t, _, cols = spec.partition("=")
                pks[t] = [c.strip() for c in cols.split(",") if c.strip()]
            tables = _load_sources(spark, args.source)
            if args.table:
                tables = {t: df for t, df in tables.items() if t in set(args.table)}
            from .operators.fk import topo_stages

            edges = [tuple(e.split("=", 1)) for e in args.edge]
            ordered = [
                t for stage in topo_stages(edges, list(tables)) for t in stage
            ]
            report = {}
            for t in ordered:
                df = tables[t]
                # live-DB portability: arrays/structs/maps ship as JSON
                # text, timestamps as canonical strings — DBAPI drivers
                # bind scalars only
                cols = []
                for f in df.schema.fields:
                    if isinstance(
                        f.dataType, (_T.ArrayType, _T.StructType, _T.MapType)
                    ):
                        cols.append(_F.to_json(_F.col(f.name)).alias(f.name))
                    elif isinstance(f.dataType, _T.TimestampType):
                        cols.append(_F.col(f.name).cast("string").alias(f.name))
                    else:
                        cols.append(_F.col(f.name))
                flat = df.select(*cols)
                pk = pks.get(t, flat.columns)
                # NULLs in the conflict target break the insert-if-absent
                # idempotency claim: SQLite treats NULL PK entries as
                # distinct (re-running restore duplicates the rows) and
                # Postgres rejects the insert outright (PK implies NOT
                # NULL). Fail fast with the remedy instead.
                null_counts = flat.select(
                    *[
                        _F.sum(_F.col(c).isNull().cast("long")).alias(c)
                        for c in pk
                    ]
                ).first()
                bad = [c for c in pk if (null_counts[c] or 0) > 0]
                if bad:
                    hint = (
                        f"pass --pk {t}=<non-null cols>"
                        if t not in pks
                        else f"--pk columns for {t} contain NULLs"
                    )
                    raise ValueError(
                        f"table {t}: NULLs in conflict-target column(s) "
                        f"{bad}; {hint} (a PRIMARY KEY cannot carry NULLs "
                        "idempotently: SQLite duplicates, Postgres rejects)"
                    )
                ddl = create_table_sql(f'"{t}"', flat.schema, pk_cols=pk)
                execute_ddl(args.dsn, ddl)
                JdbcUpsertWriter(dsn=args.dsn, table=t, pk_cols=pk).upsert(flat)
                conn, _x = open_dbapi(args.dsn)
                try:
                    # two-step cursor use: sqlite3's execute() returns the
                    # cursor but psycopg2's returns None, so chaining
                    # .execute(...).fetchone() breaks on the postgres path
                    cur = conn.cursor()
                    cur.execute(f'SELECT COUNT(*) FROM "{t}"')
                    n = cur.fetchone()[0]
                finally:
                    conn.close()
                report[t] = {"rows_in_db": int(n),
                             "pk": pk if t in pks else "all-columns"}
            print(json.dumps({"ok": True, "dsn": args.dsn, "tables": report}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "pagerank":
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as _F

        from .operators.graph import pagerank_units
        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            li = load_table(spark, args.source, "lineitem")
            ps = li.select("l_orderkey", "l_partkey").distinct()
            a, b = ps.alias("a"), ps.alias("b")
            joined = a.join(
                b,
                (_F.col("a.l_orderkey") == _F.col("b.l_orderkey"))
                & (_F.col("a.l_partkey") < _F.col("b.l_partkey")),
            )
            if args.weighted:
                # join rows are unique per (order, src, dst): the count
                # per pair is the shared-order weight
                half = (
                    joined.groupBy(
                        _F.col("a.l_partkey").alias("src"),
                        _F.col("b.l_partkey").alias("dst"),
                    )
                    .agg(_F.count(_F.lit(1)).alias("w"))
                    .localCheckpoint()
                )
                edges = half.unionByName(
                    half.select(
                        _F.col("dst").alias("src"),
                        _F.col("src").alias("dst"),
                        "w",
                    )
                )
            else:
                half = (
                    joined.select(
                        _F.col("a.l_partkey").alias("src"),
                        _F.col("b.l_partkey").alias("dst"),
                    )
                    .distinct()
                    .localCheckpoint()
                )
                edges = half.unionByName(
                    half.select(
                        _F.col("dst").alias("src"), _F.col("src").alias("dst")
                    )
                )
            seeds = (
                [int(x) for x in args.seeds.split(",")]
                if args.seeds else None
            )
            pr = pagerank_units(
                edges, iters=args.iters, checkpoint_edges=False,
                symmetric=True, seeds=seeds,
                weight_col="w" if args.weighted else None,
            )
            w = _W.orderBy(
                _F.col("pr_units").desc(), _F.col("node").asc()
            )
            head = (
                pr.withColumn("rank", _F.row_number().over(w))
                .filter(_F.col("rank") <= args.top)
                .collect()
            )
            print(json.dumps({
                "ok": True, "iters": args.iters,
                "personalized": seeds is not None,
                "weighted": bool(args.weighted),
                "rows": [r.asDict() for r in head],
            }, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "hits":
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as _F

        from .operators.graph import hits_units
        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            orders = load_table(spark, args.source, "orders")
            li = load_table(spark, args.source, "lineitem")
            edges = (
                orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
                .select(
                    _F.col("o_custkey").alias("src"),
                    _F.col("l_suppkey").alias("dst"),
                )
                .distinct()
            )
            hubs, auths = hits_units(edges, iters=args.iters)
            wa = _W.orderBy(_F.col("auth_units").desc(), _F.col("node").asc())
            wh = _W.orderBy(_F.col("hub_units").desc(), _F.col("node").asc())
            top_a = (
                auths.withColumn("rank", _F.row_number().over(wa))
                .filter(_F.col("rank") <= args.top)
                .collect()
            )
            top_h = (
                hubs.withColumn("rank", _F.row_number().over(wh))
                .filter(_F.col("rank") <= args.top)
                .collect()
            )
            print(json.dumps({
                "ok": True, "iters": args.iters,
                "authorities": [r.asDict() for r in top_a],
                "hubs": [r.asDict() for r in top_h],
            }, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "retrieve":
        import re as _re

        from pyspark.sql import functions as _F

        from .operators.retrieval import (
            bm25_topk,
            doc_tokens,
            ql_dirichlet_topk,
            rrf_fuse_n,
            term_stats,
        )
        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            docs = load_table(spark, args.source, args.table)
            qbe = bool(args.query_doc_ids)
            if qbe == bool(args.query):
                print(json.dumps({
                    "ok": False,
                    "error": "exactly one of --query/--query-doc-ids "
                    "is required",
                }))
                return 2
            if qbe:
                ids = [int(x) for x in args.query_doc_ids.split(",")]
                qterms = (
                    doc_tokens(docs.filter(_F.col("doc_id").isin(ids)))
                    .select(_F.col("doc_id").alias("query_id"), "term")
                    .distinct()
                )
            else:
                # same normalization as doc_tokens: lowercase, collapse
                # whitespace — applied driver-side to the tiny query list
                rows = [
                    (qi, tok)
                    for qi, qtext in enumerate(args.query)
                    for tok in _re.sub(r"\s+", " ", qtext.lower()).strip().split(" ")
                    if tok
                ]
                qterms = spark.createDataFrame(
                    rows, "query_id bigint, term string"
                )
            kw = dict(
                k=args.k, prefilter_buckets=8, exclude_self=qbe
            )
            if args.method == "bm25":
                res = bm25_topk(docs, qterms, k1=args.k1, b=args.b, **kw)
            elif args.method == "ql":
                res = ql_dirichlet_topk(docs, qterms, mu=args.mu, **kw)
            elif args.method == "jm":
                from .operators.retrieval import ql_jm_topk

                res = ql_jm_topk(docs, qterms, lam=args.lam, **kw)
            elif args.method == "tfidf":
                from .operators.retrieval import tfidf_cosine_topk

                res = tfidf_cosine_topk(docs, qterms, **kw)
            elif args.method == "prf":
                from .operators.retrieval import bm25_prf_topk

                if qbe:
                    print(json.dumps({
                        "ok": False,
                        "error": "prf is a free-text method (pass-1 "
                        "already IS query-by-example retrieval)",
                    }))
                    return 2
                res = bm25_prf_topk(
                    docs, qterms, k=args.k, fb_k=args.fb_k,
                    fb_terms=args.fb_terms, k1=args.k1, b=args.b,
                    prefilter_buckets=8,
                )
            else:
                from .operators.retrieval import dl_from_tf

                tf, _ = term_stats(docs)
                # dl from the CHECKPOINTED tf — checkpointing the
                # original dl plan would re-run the corpus explode
                tf = tf.localCheckpoint()
                shared = (tf, dl_from_tf(tf).localCheckpoint())
                fuse_k = max(args.k * 5, 50)
                rankers = [
                    ("bm25", bm25_topk(
                        docs, qterms, k=fuse_k, k1=args.k1, b=args.b,
                        prefilter_buckets=8, exclude_self=qbe, stats=shared,
                    ).select("query_id", "doc_id", "rank")),
                    ("ql", ql_dirichlet_topk(
                        docs, qterms, k=fuse_k, mu=args.mu,
                        prefilter_buckets=8, exclude_self=qbe, stats=shared,
                    ).select("query_id", "doc_id", "rank")),
                ]
                if args.with_dense:
                    if not qbe:
                        print(json.dumps({
                            "ok": False,
                            "error": "--with-dense needs --query-doc-ids "
                            "(the dense query is the doc's embedding)",
                        }))
                        return 2
                    from .operators.similarity import topk_blas

                    emb = load_table(
                        spark, args.source, args.embeddings_table
                    )
                    dense = topk_blas(
                        emb, emb.filter(_F.col("vec_id").isin(ids)), k=fuse_k
                    ).select(
                        "query_id",
                        _F.col("corpus_id").alias("doc_id"),
                        "rank",
                    )
                    rankers.append(("dense", dense))
                weights = None
                if args.weights:
                    weights = [int(x) for x in args.weights.split(",")]
                    if len(weights) != len(rankers):
                        print(json.dumps({
                            "ok": False,
                            "error": f"--weights needs {len(rankers)} "
                            f"integers for this fusion, got {len(weights)}",
                        }))
                        return 2
                res = rrf_fuse_n(rankers, k=args.k, weights=weights)
            rows_out = [r.asDict() for r in res.collect()]
            print(json.dumps({
                "ok": True, "method": args.method, "k": args.k,
                "n_rows": len(rows_out), "rows": rows_out,
            }, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "ann":
        from pyspark.sql import functions as _F

        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            emb = load_table(spark, args.source, args.table)
            ids = [int(x) for x in args.query_ids.split(",")]
            queries = emb.filter(_F.col("vec_id").isin(ids))
            dim = len(queries.first()["embedding"])
            if args.method == "exact":
                from .operators.similarity import topk_blas

                res = topk_blas(emb, queries, k=args.k)
            elif args.method == "lsh":
                from .operators.similarity import lsh_topk_bucketed

                res = lsh_topk_bucketed(
                    emb, queries, dim=dim, k=args.k, num_planes=args.planes,
                    num_tables=args.tables, multiprobe=args.multiprobe,
                )
            elif args.method == "ivf":
                from .operators.similarity import ivf_topk

                res = ivf_topk(
                    emb, queries, k=args.k, nlist=args.nlist,
                    nprobe=args.nprobe, quantizer=args.quantizer,
                )
            elif args.method == "pq":
                from .operators.similarity import pq_topk

                res = pq_topk(
                    emb, queries, k=args.k, m=args.m, ksub=args.ksub,
                    rerank=args.rerank, quantizer=args.quantizer,
                )
            else:  # ivfpq
                from .operators.similarity import ivf_pq_topk

                res = ivf_pq_topk(
                    emb, queries, k=args.k, nlist=args.nlist,
                    nprobe=args.nprobe, m=args.m, ksub=args.ksub,
                    quantizer=args.quantizer,
                )
            rows = [r.asDict() for r in res.collect()]
            print(json.dumps({"ok": True, "method": args.method,
                              "n_queries": len(ids), "k": args.k,
                              "rows": rows}, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "semdedup":
        from pyspark.sql import functions as _F

        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            from .operators.similarity import semantic_dedup

            emb = load_table(spark, args.source, args.table)
            labeled = semantic_dedup(
                emb, tau=args.tau, nlist=args.nlist, quantizer=args.quantizer
            )
            if args.out:
                labeled.write.mode("overwrite").parquet(args.out)
                labeled = spark.read.parquet(args.out)  # count what landed
            agg = labeled.agg(
                _F.count(_F.lit(1)).alias("n"),
                _F.sum(_F.col("kept").cast("long")).alias("n_kept"),
            ).first()
            print(json.dumps({
                "ok": True, "tau": args.tau, "nlist": args.nlist,
                "n": int(agg["n"]), "n_kept": int(agg["n_kept"]),
                "n_dup": int(agg["n"] - agg["n_kept"]),
                "out": args.out or None,
            }))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "corpus-ingest":
        from .streaming.corpus_ingest import read_corpus, start_corpus_ingest

        spark, owns = _get_session()
        try:
            query, ingestor = start_corpus_ingest(
                spark, args.source, args.target, args.checkpoint,
                once=not args.follow, near_dup=args.near_dup,
                verify_jaccard=args.verify_jaccard,
                maintain_term_stats=args.maintain_term_stats,
            )
            query.awaitTermination()
            n = read_corpus(spark, args.target).count()
            print(json.dumps({"ok": True, "target": args.target,
                              "epochs": ingestor.applied_batches,
                              "corpus_rows": n}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "embed-ingest":
        from .streaming.embedding_ingest import (
            read_embedding_index,
            start_embedding_ingest,
        )

        spark, owns = _get_session()
        try:
            query = start_embedding_ingest(
                spark, args.source, args.target, args.checkpoint,
                dim=args.dim, threshold=args.threshold,
                once=not args.follow, pq=args.pq,
            )
            query.awaitTermination()
            n = read_embedding_index(spark, args.target).count()
            print(json.dumps({"ok": True, "target": args.target,
                              "index_rows": n}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "graph-ingest":
        from .streaming.graph_ingest import (
            graph_status,
            read_ranks,
            start_graph_ingest,
        )

        spark, owns = _get_session()
        try:
            query, maintainer = start_graph_ingest(
                spark, args.source, args.target, args.checkpoint,
                once=not args.follow,
                rerank_mass_fraction=args.rerank_fraction,
                pagerank_kwargs={"iters": args.iters, "unit": args.unit},
            )
            query.awaitTermination()
            st = graph_status(spark, args.target)
            n = read_ranks(spark, args.target).count()
            print(json.dumps({"ok": True, "target": args.target,
                              "epochs": maintainer.applied_batches,
                              "rerank_epochs": maintainer.rerank_epochs,
                              "ranked_nodes": n, **st}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "graph-status":
        from .streaming.graph_ingest import graph_status

        spark, owns = _get_session()
        try:
            print(json.dumps({"ok": True, **graph_status(spark, args.target)}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "wds-export":
        from pyspark.sql import functions as _F

        from .operators.multimodal import media_table
        from .sources.catalog import load_table
        from .sources.webdataset import shard_manifest, write_tar_shards

        spark, owns = _get_session()
        try:
            df = load_table(spark, args.source, args.table)
            media = media_table(df, args.id_col, args.payload_col, args.mime)
            write_tar_shards(media, args.out, n_shards=args.shards)
            m = shard_manifest(spark, args.out).agg(
                _F.count(_F.lit(1)).alias("n_shards"),
                _F.sum("n_samples").alias("n_samples"),
            ).first()
            print(json.dumps({
                "ok": True, "out": args.out,
                "n_shards": int(m["n_shards"]),
                "n_samples": int(m["n_samples"]),
            }))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "media-dedup":
        from pyspark.sql import functions as _F

        from .operators.multimodal import media_dedup
        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            df = load_table(spark, args.source, args.table)
            labeled = media_dedup(
                df,
                id_col=args.id_col,
                payload_col=args.payload_col,
                hash_family=args.hash,
                max_hamming=args.max_hamming,
            )
            if args.out:
                labeled.write.mode("overwrite").parquet(args.out)
                labeled = spark.read.parquet(args.out)
            agg = labeled.agg(
                _F.count(_F.lit(1)).alias("n"),
                _F.sum(_F.col("kept").cast("long")).alias("n_kept"),
                _F.countDistinct("cluster_id").alias("n_clusters"),
            ).first()
            print(json.dumps({
                "ok": True, "hash": args.hash,
                "n": int(agg["n"]), "n_kept": int(agg["n_kept"]),
                "n_dup": int(agg["n"] - agg["n_kept"]),
                "n_clusters": int(agg["n_clusters"]),
                "out": args.out or None,
            }))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "drift-report":
        from .streaming.change_stream import read_drift_report

        spark, owns = _get_session()
        try:
            rep = read_drift_report(spark, args.target)
            if args.drifted_only:
                rep = rep.filter("drifted")
            rows = [r.asDict() for r in rep.orderBy("epoch", "table").collect()]
            print(json.dumps({"ok": True, "reports": rows}, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "ingest-status":
        # corpus_ingest.ingest_status reads any _ingest_stats layout, so
        # one verb serves both the lexical and the embedding target
        from .streaming.corpus_ingest import ingest_status

        spark, owns = _get_session()
        try:
            st = ingest_status(spark, args.target)
            print(json.dumps({"ok": True, "target": args.target, **st}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "sql":
        spark, owns = _get_session()
        try:
            for name, df in _load_sources(spark, args.source).items():
                df.createOrReplaceTempView(name)
            if getattr(args, "interactive", False):
                import sys as _sys

                # one JSON line per ';'-terminated statement; errors are
                # reported per-statement and the loop continues — the
                # console survives a bad query, like the reference's
                def _run_stmt(stmt: str) -> None:
                    try:
                        res = spark.sql(stmt)
                        rows = [
                            r.asDict(recursive=True)
                            for r in res.limit(args.limit).collect()
                        ]
                        print(json.dumps(
                            {"ok": True, "columns": res.columns,
                             "n_printed": len(rows), "rows": rows},
                            default=str), flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(json.dumps(
                            {"ok": False,
                             "error": f"{type(e).__name__}: {e}"},
                            default=str), flush=True)

                # a ';' at end-of-line only terminates the statement when
                # it sits OUTSIDE any string literal / quoted identifier,
                # so e.g. WHERE col = 'a;'\n stays one statement. Escape
                # forms tracked to match Spark's default lexing
                # (escapedStringLiterals=false): SQL doubling ('' / "")
                # AND backslash escapes ('don\'t' is one literal)
                def _quotes_closed(text: str) -> bool:
                    q = None
                    i = 0
                    while i < len(text):
                        ch = text[i]
                        if q is None:
                            if ch in ("'", '"'):
                                q = ch
                        elif ch == "\\":
                            i += 1  # escaped char (incl. \' \" \\)
                        elif ch == q:
                            if i + 1 < len(text) and text[i + 1] == q:
                                i += 1  # doubled quote: still inside
                            else:
                                q = None
                        i += 1
                    return q is None

                buf: list[str] = []
                for line in _sys.stdin:
                    buf.append(line)
                    if not line.rstrip().endswith(";") or not _quotes_closed(
                        "".join(buf)
                    ):
                        continue
                    stmt = "".join(buf).strip().rstrip(";").strip()
                    buf = []
                    if stmt:
                        _run_stmt(stmt)
                # EOF with a pending un-';'-terminated statement: run it
                # rather than silently discarding the user's last query
                tail_stmt = "".join(buf).strip().rstrip(";").strip()
                if tail_stmt:
                    _run_stmt(tail_stmt)
                return 0
            if not args.query:
                print(json.dumps({"ok": False,
                                  "error": "one of --query/--interactive "
                                  "is required"}))
                return 2
            result = spark.sql(args.query)
            if args.out:
                from .util import staged_overwrite

                staged_overwrite(spark, result, args.out)
                print(json.dumps({"ok": True, "out": args.out,
                                  "columns": result.columns}))
                return 0
            rows = [r.asDict(recursive=True) for r in result.limit(args.limit).collect()]
            print(json.dumps({"ok": True, "columns": result.columns,
                              "n_printed": len(rows), "rows": rows},
                             default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "audit":
        from pyspark.sql import functions as _F

        from .operators.verify import constraint_audit
        from .sources.catalog import load_table

        spark, owns = _get_session()
        try:
            df = load_table(spark, args.source, args.table)
            checks = {}
            for spec in args.check or []:
                name, _, pred = spec.partition(":")
                checks[name] = _F.expr(pred)
            fks = {}
            for spec in args.fk or []:
                child_col, _, parent = spec.partition(":")
                parent_table, _, parent_col = parent.partition(".")
                fks[f"{child_col}->{parent}"] = (
                    load_table(spark, args.source, parent_table),
                    child_col,
                    parent_col,
                )
            report = constraint_audit(
                df,
                unique_cols=args.unique,
                not_null_cols=args.not_null,
                checks=checks or None,
                fks=fks or None,
            )
            rows = [r.asDict() for r in report.orderBy("constraint").collect()]
            bad = sum(r["n_violations"] for r in rows)
            print(json.dumps({"ok": True, "table": args.table,
                              "total_violations": int(bad), "audit": rows},
                             default=str))
            return 1 if (args.fail_on_violation and bad) else 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "rollup":
        import os as _os

        from .operators.ivm import finalize, merge_partials, partial_agg
        from .sources.catalog import load_table
        from .util import staged_overwrite

        spark, owns = _get_session()
        try:
            keys = args.keys.split(",")
            measures = args.measures.split(",")
            df = load_table(spark, args.source, args.table)
            if args.filter:
                df = df.filter(args.filter)
            part = partial_agg(df, keys, measures)
            state_path = _os.path.join(args.state, "partials")
            if args.delta:
                if not _os.path.isdir(state_path):
                    print(json.dumps({"ok": False,
                                      "error": "no state to merge into; run without --delta first"}))
                    return 2
                prev = spark.read.parquet(state_path)
                part = merge_partials([prev, part], keys, measures)
            staged_overwrite(spark, part, state_path)
            view = finalize(spark.read.parquet(state_path), keys, measures)
            rows = [r.asDict() for r in view.orderBy(*keys).collect()]
            print(json.dumps({"ok": True, "mode": "delta" if args.delta else "init",
                              "groups": len(rows), "rollup": rows}, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "explain":
        from . import queries as q

        spark, owns = _get_session()
        try:
            fns = q.all_queries()
            if args.query not in fns:
                import difflib

                near = difflib.get_close_matches(args.query, fns, n=5)
                print(json.dumps({"ok": False,
                                  "error": f"unknown query {args.query!r}",
                                  "did_you_mean": near}))
                return 2
            df = fns[args.query](spark, args.source)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), args.mode
            )
            print(plan)
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "diff":
        spark, owns = _get_session()
        try:
            from .operators.reconcile import row_diff

            src = _load_sources(spark, args.source)
            tgt = _load_sources(spark, args.target)
            if args.table not in src or args.table not in tgt:
                missing = [d for d, t in (("source", src), ("target", tgt))
                           if args.table not in t]
                print(json.dumps({"ok": False,
                                  "error": f"table {args.table!r} absent in "
                                           + "/".join(missing)}))
                return 2
            d = row_diff(src[args.table], tgt[args.table], args.pk)
            counts = {
                r["status"]: r["n"]
                for r in d.groupBy("status").count()
                .withColumnRenamed("count", "n").collect()
            }
            sample = [r.asDict() for r in d.limit(args.limit).collect()]
            print(json.dumps({"ok": True, "table": args.table,
                              "counts": counts, "sample": sample},
                             default=str))
            return 0 if not counts else 1
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "sample":
        spark, owns = _get_session()
        try:
            from .operators.fk import fk_consistent_sample

            tables = _load_sources(spark, args.source)
            edges = []
            for spec in args.edge:
                child_part, parent_part = spec.split("=", 1)
                child, fk_col = child_part.split(".", 1)
                parent, pk_col = parent_part.split(".", 1)
                edges.append((child, fk_col, parent, pk_col))
            sampled = fk_consistent_sample(
                tables, args.root, args.root_key, edges,
                rate=args.rate, seed=args.seed,
            )
            counts = {}
            for name, df in sampled.items():
                df.write.mode("overwrite").parquet(
                    os.path.join(args.target, f"{name}.parquet")
                )
                counts[name] = df.count()
            print(json.dumps({"ok": True, "rate": args.rate,
                              "row_counts": counts}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "optimize":
        spark, owns = _get_session()
        try:
            from .operators.layout import compact_parquet_dir

            rep = compact_parquet_dir(
                spark, args.path, target_file_mb=args.target_file_mb,
                sort_cols=args.sort_col,
            )
            print(json.dumps({"ok": True, **rep}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "compact":
        spark, owns = _get_session()
        try:
            from .streaming.change_stream import compact_change_log

            done = []
            if os.path.isdir(os.path.join(args.target, "_change_log")):
                compact_change_log(spark, args.target)
                done.append("_change_log")
            if args.ingest_indexes:
                from .streaming.corpus_ingest import compact_ingest_indexes

                compact_ingest_indexes(spark, args.target)
                done.append("ingest_indexes")
            print(json.dumps({"ok": True, "compacted": done}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "asof":
        spark, owns = _get_session()
        try:
            from .streaming.change_stream import read_table_asof

            df = read_table_asof(spark, args.target, args.table, args.epoch)
            if args.out:
                df.write.mode("overwrite").parquet(args.out)
            n = df.count()
            sample = [r.asDict() for r in df.limit(5).collect()]
            print(json.dumps({"ok": True, "table": args.table,
                              "epoch": args.epoch, "rows": n,
                              "sample": sample,
                              "out": args.out}, default=str))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "datasheet":
        from .pipeline import corpus_datasheet

        spark, owns = _get_session()
        try:
            sheet = corpus_datasheet(
                spark, args.source, approximate=args.approximate
            )
            if args.embeddings:
                from .pipeline import embedding_datasheet

                sheet["embeddings"] = embedding_datasheet(spark, args.source)
            print(json.dumps({"ok": True, **sheet}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "corpus-build":
        from .pipeline import build_corpus

        spark, owns = _get_session()
        try:
            report = build_corpus(
                spark,
                args.source,
                args.out,
                budget=args.budget,
                n_shards=args.shards,
                alpha=args.temperature,
                seed=args.seed,
                min_tokens=args.min_tokens,
                near_dup=args.near_dup,
                semantic_dedup=args.semantic_dedup,
                semantic_threshold=args.semantic_threshold,
                span_mask=args.span_mask,
                chunk_dedup=args.chunk_dedup,
                token_budget=args.token_budget,
                classifier_threshold=args.classifier_threshold,
                export_jsonl=args.export_jsonl,
                source_priority={
                    kv.split("=", 1)[0]: int(kv.split("=", 1)[1])
                    for kv in (args.prefer_source or [])
                } or None,
                with_datasheet=args.datasheet,
            )
            print(json.dumps({"ok": True, **report}))
            return 0
        except Exception as e:
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2
        finally:
            if owns:
                spark.stop()

    if args.command == "replication-plan":
        from .plans.rules import ReplicationFilter
        from .sources.replication import logical_replication_plan

        try:
            filt = ReplicationFilter(
                exclude_tables=[t for t in (args.exclude_table or [])],
            )
            for spec in args.table_filter or []:
                table, _, pred = spec.partition(":")
                filt.rules.add_predicate(table, pred)
            for t in args.schema_only or []:
                filt.rules.add_schema_only(t)
            tables = None
            if args.publish_table:
                tables = []
                for t in args.publish_table:
                    schema, _, name = t.rpartition(".")
                    tables.append((schema or "public", name))
            plan = logical_replication_plan(
                args.publication,
                args.subscription,
                args.source_conn,
                tables=tables,
                db_name=args.db_name,
                filter=None if filt.is_empty() else filt,
                server_version=args.server_version,
            )
            print(json.dumps({"ok": True, "plan": plan}))
            return 0
        except Exception as e:  # validation failures → clean CLI error
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
            return 2

    if args.command == "status":
        from .engine import Engine, ParquetTarget

        spark, owns = _get_session()
        eng = Engine(spark=spark, source_tables={}, target=ParquetTarget(args.target))
        print(json.dumps(eng.status(), indent=2, default=str))
        if owns:
            spark.stop()
        return 0

    t0 = time.time()
    try:
        spark, owns, eng = _build_engine(args)
    except Exception as e:  # rule conflicts, bad specs → clean CLI error
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}))
        return 2
    try:
        if args.command == "validate":
            problems = eng.validate(source_id=args.source, target_id=args.target)
            print(json.dumps({"ok": not problems, "problems": problems}))
            return 1 if problems else 0
        if args.command == "init":
            results = eng.init_snapshot(checkpoint_path=args.checkpoint)
            print(json.dumps({"results": results, "seconds": round(time.time() - t0, 1)}))
            return 0
        if args.command == "sync":
            if args.once:
                out = eng.sync_cycle(args.table, args.watermark_col, args.pk)
                if args.reconcile:
                    out["reconcile"] = eng.reconcile(args.table, args.pk)
                print(json.dumps(out))
                return 0
            # daemon mode (reference default): loop until interrupted
            reports = eng.run_sync_daemon(
                {args.table: (args.watermark_col, args.pk)},
                sync_interval_s=args.interval,
            )
            print(json.dumps(reports[-1] if reports else {}))
            return 0
        if args.command == "verify":
            results = eng.verify()
            bad = [t for t, r in results.items() if r["status"] != "match"]
            print(json.dumps({"ok": not bad, "tables": results}))
            return 1 if bad else 0
        if args.command == "drift":
            results = eng.check_drift()
            drifted = [t for t, r in results.items() if r["status"] == "drifted"]
            print(json.dumps({"ok": not drifted, "tables": results}))
            return 1 if drifted else 0
    finally:
        if owns:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
