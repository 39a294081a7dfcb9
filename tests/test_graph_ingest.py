"""Incremental graph maintenance (streaming/graph_ingest.py): the
restart contract — maintained ranks are BIT-EQUAL to a batch
pagerank_units over the accumulated edges — plus threshold gating,
replay idempotency, staleness visibility, and compaction safety."""

import json
import os

import pytest

from pyspark.sql import functions as F

from database_replicator_spark.operators.graph import pagerank_units
from database_replicator_spark.streaming.graph_ingest import (
    GraphMaintainer,
    compact_graph_edges,
    graph_status,
    read_graph_edges,
    read_ranks,
    start_graph_ingest,
)

PR_KW = dict(iters=3, unit=10**9)

EPOCHS = [
    # epoch 0: a small ring + chord
    [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 2)],
    # epoch 1: re-observations (weight accumulation) + new node
    [(1, 2, 3), (3, 4, 1)],
    # epoch 2: tiny delta (below a 30% threshold after epoch 1)
    [(4, 1, 1)],
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _ranks_dict(df):
    return {r["node"]: r["pr_units"] for r in df.collect()}


class TestMaintainer:
    def test_incremental_equals_batch_over_epochs(self, spark, tmp_path):
        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.0, pagerank_kwargs=PR_KW
        )
        seen = []
        for e, rows in enumerate(EPOCHS):
            ing.ingest_batch(_mk(spark, rows), e)
            seen += rows
            batch_edges = (
                _mk(spark, seen).groupBy("src", "dst").agg(F.sum("w").alias("w"))
            )
            expect = _ranks_dict(
                pagerank_units(batch_edges, weight_col="w", **PR_KW)
            )
            got = _ranks_dict(read_ranks(spark, tgt))
            assert got == expect, f"epoch {e}"
        # the maintained store is the batch edge relation
        assert sorted(
            tuple(r) for r in read_graph_edges(spark, tgt).collect()
        ) == sorted(
            tuple(r) for r in batch_edges.collect()
        )

    def test_threshold_gates_rerank_and_status_reports(self, spark, tmp_path):
        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.3, pagerank_kwargs=PR_KW
        )
        ing.ingest_batch(_mk(spark, EPOCHS[0]), 0)  # first epoch always ranks
        ing.ingest_batch(_mk(spark, EPOCHS[1]), 1)  # 4/5 = 0.8 >= 0.3 → rank
        ing.ingest_batch(_mk(spark, EPOCHS[2]), 2)  # 1/9 ≈ 0.11 < 0.3 → defer
        assert ing.rerank_epochs == [0, 1]
        st = graph_status(spark, tgt)
        assert st["ranked_through_epoch"] == 1
        assert st["pending_mass"] == 1 and st["epochs_behind"] == 1
        assert 0 < st["pending_fraction"] < 0.3
        # served vector is the epoch-1 refresh (node 4 has no in-mass yet
        # beyond epoch 1's edge), NOT the epoch-2 graph
        stale = _ranks_dict(read_ranks(spark, tgt))
        through_e1 = (
            _mk(spark, EPOCHS[0] + EPOCHS[1])
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        assert stale == _ranks_dict(
            pagerank_units(through_e1, weight_col="w", **PR_KW)
        )
        # the next epoch's delta pushes pending over the line → catch-up
        ing.ingest_batch(_mk(spark, [(2, 4, 3)]), 3)
        assert ing.rerank_epochs == [0, 1, 3]
        assert graph_status(spark, tgt)["pending_mass"] == 0

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.0, pagerank_kwargs=PR_KW
        )
        for e, rows in enumerate(EPOCHS):
            ing.ingest_batch(_mk(spark, rows), e)
        before = sorted(tuple(r) for r in read_graph_edges(spark, tgt).collect())
        ranks_before = _ranks_dict(read_ranks(spark, tgt))
        # a restarted stream redelivers epoch 2
        ing2 = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.0, pagerank_kwargs=PR_KW
        )
        ing2.ingest_batch(_mk(spark, EPOCHS[2]), 2)
        assert (
            sorted(tuple(r) for r in read_graph_edges(spark, tgt).collect())
            == before
        )
        assert _ranks_dict(read_ranks(spark, tgt)) == ranks_before

    def test_compaction_preserves_relation_and_refuses_pending(
        self, spark, tmp_path
    ):
        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.3, pagerank_kwargs=PR_KW
        )
        ing.ingest_batch(_mk(spark, EPOCHS[0]), 0)
        ing.ingest_batch(_mk(spark, EPOCHS[1]), 1)
        ing.ingest_batch(_mk(spark, EPOCHS[2]), 2)  # deferred → pending
        with pytest.raises(ValueError, match="pending"):
            compact_graph_edges(spark, tgt)
        # force the refresh, then compact
        ing2 = GraphMaintainer(
            target_dir=tgt, rerank_mass_fraction=0.0, pagerank_kwargs=PR_KW
        )
        ing2.ingest_batch(_mk(spark, [(9, 1, 1)]), 3)
        before = sorted(tuple(r) for r in read_graph_edges(spark, tgt).collect())
        compact_graph_edges(spark, tgt)
        after = sorted(tuple(r) for r in read_graph_edges(spark, tgt).collect())
        assert after == before
        eps = os.listdir(os.path.join(tgt, "_edges"))
        assert [d for d in eps if d.startswith("epoch=")] == ["epoch=0"]
        assert graph_status(spark, tgt)["pending_mass"] == 0
        # maintenance continues cleanly after compaction
        ing2.ingest_batch(_mk(spark, [(9, 2, 1)]), 4)
        assert graph_status(spark, tgt)["ranked_through_epoch"] == 4


class TestStreamWiring:
    def test_end_to_end_json_queue(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        for e, rows in enumerate(EPOCHS):
            with open(src / f"batch{e}.json", "w") as f:
                for s, d, w in rows:
                    f.write(json.dumps({"src": s, "dst": d, "w": w}) + "\n")
        q, ing = start_graph_ingest(
            spark,
            str(src),
            str(tmp_path / "tgt"),
            str(tmp_path / "chk"),
            once=True,
            rerank_mass_fraction=0.0,
            pagerank_kwargs=PR_KW,
        )
        q.awaitTermination(120)
        allrows = [r for rows in EPOCHS for r in rows]
        batch_edges = (
            _mk(spark, allrows).groupBy("src", "dst").agg(F.sum("w").alias("w"))
        )
        assert _ranks_dict(read_ranks(spark, str(tmp_path / "tgt"))) == _ranks_dict(
            pagerank_units(batch_edges, weight_col="w", **PR_KW)
        )


class TestGraphCli:
    def test_graph_ingest_and_status_verbs(self, spark, tmp_path, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        src = tmp_path / "q"
        src.mkdir()
        with open(src / "b0.json", "w") as f:
            for s, d, w in EPOCHS[0] + EPOCHS[1]:
                f.write(json.dumps({"src": s, "dst": d, "w": w}) + "\n")
        rc = main([
            "graph-ingest", "--source", str(src),
            "--target", str(tmp_path / "tgt"),
            "--checkpoint", str(tmp_path / "chk"),
            "--rerank-fraction", "0",
        ])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        assert out["ranked_nodes"] == 4 and out["pending_mass"] == 0
        assert out["rerank_epochs"] == [0]

        rc = main(["graph-status", "--target", str(tmp_path / "tgt")])
        st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and st["ok"] and st["epochs_behind"] == 0


class TestHitsMaintainer:
    def test_incremental_hits_equals_batch(self, spark, tmp_path):
        from database_replicator_spark.operators.graph import hits_units

        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt,
            rerank_mass_fraction=0.0,
            pagerank_kwargs=dict(iters=2),
            rank_fn="hits",
        )
        for e, rows in enumerate(EPOCHS):
            ing.ingest_batch(_mk(spark, rows), e)
        got = {
            r["node"]: (r["hub_units"], r["auth_units"])
            for r in read_ranks(spark, tgt).collect()
        }
        allrows = [r for rows in EPOCHS for r in rows]
        edges = _mk(spark, allrows).groupBy("src", "dst").agg(
            F.sum("w").alias("w")
        )
        hubs, auths = hits_units(edges, iters=2)
        expect = {}
        for r in hubs.collect():
            expect[r["node"]] = [r["hub_units"], 0]
        for r in auths.collect():
            expect.setdefault(r["node"], [0, 0])[1] = r["auth_units"]
        assert got == {k: tuple(v) for k, v in expect.items()}

    def test_unknown_rank_fn_rejected(self, tmp_path):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="rank_fn"):
            GraphMaintainer(target_dir=str(tmp_path), rank_fn="simrank")


class TestUnweightedMaintainer:
    def test_weighted_false_matches_unweighted_batch(self, spark, tmp_path):
        tgt = str(tmp_path / "g")
        ing = GraphMaintainer(
            target_dir=tgt,
            rerank_mass_fraction=0.0,
            pagerank_kwargs=PR_KW,
            weighted=False,
        )
        for e, rows in enumerate(EPOCHS):
            ing.ingest_batch(_mk(spark, rows), e)
        allrows = [r for rows in EPOCHS for r in rows]
        # unweighted: the accumulated per-pair relation, weights ignored
        edges = (
            _mk(spark, allrows).groupBy("src", "dst").agg(F.sum("w").alias("w"))
        )
        expect = _ranks_dict(pagerank_units(edges, **PR_KW))
        assert _ranks_dict(read_ranks(spark, tgt)) == expect
