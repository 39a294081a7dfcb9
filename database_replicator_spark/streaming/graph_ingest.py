"""Incremental graph maintenance: an edge-delta store + threshold-gated
re-ranking, so the graph tier (operators/graph.py) joins the retrieval
index (corpus_ingest.maintain_term_stats) in being stream-maintained
instead of batch-only.

The problem this solves: new co-purchase/citation edges used to force a
full source rescan before any PageRank refresh. Here each change-stream
epoch appends its (src, dst, w) delta as its own parquet partition —
O(delta) work, idempotent per epoch like every other epoch index in this
package — and the accumulated store IS the edge relation, so a refresh
is rank-iteration-bound, never source-scan-bound.

**Restart-vs-warm-start contract** (the part callers must not guess):

* A refresh RESTARTS the power iteration: ``pagerank_units`` runs from
  uniform init over the FULL accumulated edge store with the maintainer's
  pinned parameters. That makes the maintained rank vector EQUAL BY
  CONSTRUCTION to a batch build over the same edges (the term-stats
  equality story, pinned by tests/test_graph_ingest.py) — bit-equal, not
  approximately: integer fixed-point PageRank is deterministic.
* WARM-starting (seeding the next iteration with the previous vector) is
  deliberately NOT offered as the default: fixed-iteration integer PR
  from a warm vector is a *different function* of the graph than from
  uniform init, so incremental and batch would diverge by construction
  and every equality test (and cross-engine oracle) dies. At cluster
  scale a convergence-mode caller (iters 30+, run-to-fixpoint) can pass
  the previous vector via their own loop around ``pagerank_units`` —
  the trade (fewer iterations vs reproducibility) is theirs to take
  explicitly, not a silent default.
* Between refreshes the served vector is the last computed one;
  staleness is BOUNDED and VISIBLE: a refresh fires as soon as pending
  delta mass reaches ``rerank_mass_fraction`` of the ranked mass, and
  ``graph_status`` reports the pending fraction + epochs behind at any
  time. ``rerank_mass_fraction=0`` refreshes every epoch.

Scale shape: per-epoch cost is one delta-sized aggregate + append; the
edge store reads as ordinary partitioned parquet (epoch-pruned, never
driver-materialized); refresh cost is exactly one ``pagerank_units``
run (its own scaling is probed in SCALING.md, exponent 0.73). The mass
counter rides the same delta aggregate — no full-store scan per epoch;
``compact_graph_edges`` bounds partition-listing growth for long queues
(same posture as compact_ingest_indexes: stream stopped, epochs
committed).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class GraphMaintainer:
    """foreachBatch sink maintaining an edge store + rank vector.

    ``pagerank_kwargs`` pins the rank function (iters, unit, symmetric,
    damping, weight handling is always via the accumulated ``w``):
    refreshes always run the SAME function, so any two maintainers with
    equal stores and kwargs serve equal vectors."""

    target_dir: str
    rerank_mass_fraction: float = 0.05
    pagerank_kwargs: dict = field(default_factory=dict)
    weighted: bool = True
    #: "pagerank" (default; weighted by the accumulated Σw) or "hits"
    #: (unweighted by definition — the store's per-pair aggregation
    #: still dedups re-observed edges; ranks relation carries
    #: (node, hub_units, auth_units), zero-filled on one-sided nodes)
    rank_fn: str = "pagerank"
    applied_batches: list = field(default_factory=list)
    rerank_epochs: list = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.rank_fn not in ("pagerank", "hits"):
            raise ValueError(
                f"rank_fn must be 'pagerank' or 'hits', got {self.rank_fn!r}"
            )

    def _path(self, name: str) -> str:
        return os.path.join(self.target_dir, name)

    # -- meta: tiny JSON sidecar (driver-written once per epoch; the
    # same single-writer discipline as the streaming checkpoint itself)
    def _read_meta(self) -> dict:
        try:
            with open(self._path("_rank_meta.json")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"ranked_through_epoch": None, "ranked_mass": 0}

    def _write_meta(self, meta: dict) -> None:
        os.makedirs(self.target_dir, exist_ok=True)
        tmp = self._path("_rank_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._path("_rank_meta.json"))

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Append the epoch's edge delta; refresh ranks when pending
        mass crosses the threshold. Idempotent per epoch: a replayed
        epoch overwrites its own partition and recomputes the meta from
        the store, never double-counts."""
        spark = batch.sparkSession
        delta = (
            batch.select(
                F.col("src").cast("bigint"),
                F.col("dst").cast("bigint"),
                (
                    F.col("w") if "w" in batch.columns else F.lit(1)
                ).cast("bigint").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(self._path("_edges"), f"epoch={epoch_id}")
        )
        self.applied_batches.append(epoch_id)

        # pending mass: Σw over epochs newer than the ranked watermark.
        # Computed from the STORE (not an in-memory counter) so replays
        # and restarts converge on the same decision.
        meta = self._read_meta()
        store = spark.read.option("basePath", self._path("_edges")).parquet(
            self._path("_edges")
        )
        ranked_through = meta["ranked_through_epoch"]
        pending_df = (
            store
            if ranked_through is None
            else store.filter(F.col("epoch") > ranked_through)
        )
        pending = pending_df.agg(F.sum("w")).first()[0] or 0
        ranked = meta["ranked_mass"]
        if ranked and pending / ranked < self.rerank_mass_fraction:
            return  # serve the existing vector; staleness visible in status
        self._refresh(spark, store, epoch_id)

    def _refresh(self, spark: SparkSession, store: DataFrame, epoch_id: int) -> None:
        from ..util import staged_overwrite

        edges = (
            store.groupBy("src", "dst").agg(F.sum("w").alias("w"))
        )
        kwargs = dict(self.pagerank_kwargs)
        if self.rank_fn == "hits":
            from ..operators.graph import hits_units

            hubs, auths = hits_units(edges, **kwargs)
            ranks = (
                hubs.join(auths, on="node", how="full")
                .select(
                    "node",
                    F.coalesce("hub_units", F.lit(0)).alias("hub_units"),
                    F.coalesce("auth_units", F.lit(0)).alias("auth_units"),
                )
            )
        else:
            from ..operators.graph import pagerank_units

            if self.weighted:
                kwargs.setdefault("weight_col", "w")
            ranks = pagerank_units(edges, **kwargs)
        staged_overwrite(spark, ranks, self._path("ranks"))
        total = edges.agg(F.sum("w")).first()[0] or 0
        self._write_meta(
            {"ranked_through_epoch": epoch_id, "ranked_mass": int(total)}
        )
        self.rerank_epochs.append(epoch_id)


def start_graph_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    rerank_mass_fraction: float = 0.05,
    pagerank_kwargs: dict | None = None,
):
    """Wire a JSON-lines edge queue (src, dst, w) → GraphMaintainer →
    streaming query (Trigger.AvailableNow for --once parity, like
    change_stream / corpus_ingest)."""
    maintainer = GraphMaintainer(
        target_dir=target_dir,
        rerank_mass_fraction=rerank_mass_fraction,
        pagerank_kwargs=pagerank_kwargs or {},
    )
    stream = (
        spark.readStream.schema("src long, dst long, w long")
        .option("maxFilesPerTrigger", 10)
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(maintainer.ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer = writer.trigger(availableNow=True) if once else writer.trigger(
        processingTime="60 seconds"
    )
    return writer.start(), maintainer


def read_graph_edges(spark: SparkSession, target_dir: str) -> DataFrame:
    """The accumulated (src, dst, w) edge relation — per-pair weights
    summed across epochs; the exact input a batch builder would pass to
    ``pagerank_units``."""
    path = os.path.join(target_dir, "_edges")
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )


def read_ranks(spark: SparkSession, target_dir: str) -> DataFrame:
    """The served rank vector (node, pr_units) as of the last refresh."""
    return spark.read.parquet(os.path.join(target_dir, "ranks"))


def graph_status(spark: SparkSession, target_dir: str) -> dict:
    """Staleness report: ranked watermark, pending delta mass and its
    fraction of ranked mass, epochs behind."""
    m_path = os.path.join(target_dir, "_rank_meta.json")
    try:
        with open(m_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        meta = {"ranked_through_epoch": None, "ranked_mass": 0}
    path = os.path.join(target_dir, "_edges")
    store = spark.read.option("basePath", path).parquet(path)
    ranked_through = meta["ranked_through_epoch"]
    pending_df = (
        store
        if ranked_through is None
        else store.filter(F.col("epoch") > ranked_through)
    )
    agg = pending_df.agg(
        F.coalesce(F.sum("w"), F.lit(0)).alias("mass"),
        F.countDistinct("epoch").alias("epochs"),
    ).first()
    ranked = meta["ranked_mass"]
    return {
        "ranked_through_epoch": ranked_through,
        "ranked_mass": ranked,
        "pending_mass": int(agg["mass"]),
        "pending_fraction": (agg["mass"] / ranked) if ranked else None,
        "epochs_behind": int(agg["epochs"]),
    }


def compact_graph_edges(spark: SparkSession, target_dir: str) -> None:
    """Collapse the per-epoch edge partitions into one pre-aggregated
    ``epoch=0`` partition, bounding partition-listing growth for
    long-running queues. Run with the stream stopped and only once epoch
    0's checkpoint offset is committed (the corpus_ingest caveat);
    weights are summed on the way through, so the accumulated relation —
    and therefore every future refresh — is unchanged.

    Refuses to run while delta mass is pending: compaction folds every
    epoch into the ranked watermark's past, so compacting un-ranked mass
    would silently mark it ranked — refresh first (or lower the
    threshold to force one), then compact."""
    import shutil

    from ..util import staged_overwrite

    path = os.path.join(target_dir, "_edges")
    if not os.path.isdir(path):
        return
    status = graph_status(spark, target_dir)
    if status["pending_mass"]:
        raise ValueError(
            f"{status['pending_mass']} units of delta mass are pending "
            f"(epochs_behind={status['epochs_behind']}): compacting now "
            "would mark them ranked without a refresh — refresh first"
        )
    compacted = (
        spark.read.option("basePath", path)
        .parquet(path)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    staged_overwrite(
        spark, compacted, os.path.join(path + ".compact", "epoch=0")
    )
    shutil.rmtree(path)
    os.rename(path + ".compact", path)
    meta_path = os.path.join(target_dir, "_rank_meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return
    if meta.get("ranked_through_epoch") is not None:
        meta["ranked_through_epoch"] = 0
        with open(meta_path, "w") as f:
            json.dump(meta, f)
