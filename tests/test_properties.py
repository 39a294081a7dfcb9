"""Property-based tests (hypothesis) for the engine's algebraic contracts.

The reference has no property-based tier (SURVEY.md §5); these pin the
invariants the whole design leans on: checksum order-insensitivity, merge
idempotency/last-write-wins, change-application order-independence, and
COPY escaping round-trips.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),                      # id
        st.text(min_size=0, max_size=8),                             # name
        st.integers(min_value=-1000, max_value=1000),                # v
    ),
    min_size=0,
    max_size=25,
)


class TestChecksumProperties:
    @settings(**SETTINGS)
    @given(rows=rows_strategy, seed=st.integers(min_value=0, max_value=5))
    def test_order_and_partition_invariance(self, spark, rows, seed):
        from database_replicator_spark.operators.verify import table_checksum

        if not rows:
            return
        df = spark.createDataFrame(rows, "id int, name string, v int")
        shuffled = df.orderBy(F.rand(seed)).repartition(3)
        assert table_checksum(df) == table_checksum(shuffled)

    @settings(**SETTINGS)
    @given(rows=rows_strategy)
    def test_content_change_changes_checksum(self, spark, rows):
        from database_replicator_spark.operators.verify import table_checksum

        if not rows:
            return
        df = spark.createDataFrame(rows, "id int, name string, v int")
        mutated = df.withColumn("v", F.col("v") + 1)
        assert table_checksum(df) != table_checksum(mutated)


class TestMergeProperties:
    @settings(**SETTINGS)
    @given(
        base=st.dictionaries(st.integers(0, 10), st.integers(-100, 100), max_size=8),
        updates=st.dictionaries(st.integers(0, 10), st.integers(-100, 100), max_size=8),
    )
    def test_merge_semantics_match_dict_update(self, spark, base, updates):
        """merge_upsert == Python dict.update on the PK→value mapping."""
        from database_replicator_spark.operators.incremental import merge_upsert

        base_df = spark.createDataFrame(
            [(k, v) for k, v in base.items()] or [], "id int, v int"
        )
        upd_df = spark.createDataFrame(
            [(k, v) for k, v in updates.items()] or [], "id int, v int"
        )
        merged = merge_upsert(base_df, upd_df, ["id"])
        got = {r["id"]: r["v"] for r in merged.collect()}
        expected = {**base, **updates}
        assert got == expected

    @settings(**SETTINGS)
    @given(
        updates=st.dictionaries(st.integers(0, 10), st.integers(-100, 100), max_size=8)
    )
    def test_merge_idempotent(self, spark, updates):
        """Replaying the same update batch leaves the table unchanged —
        the at-least-once recovery contract (ST4)."""
        from database_replicator_spark.operators.incremental import merge_upsert

        base_df = spark.createDataFrame([(1, 1), (2, 2)], "id int, v int")
        upd_df = spark.createDataFrame(
            [(k, v) for k, v in updates.items()] or [], "id int, v int"
        )
        once = merge_upsert(base_df, upd_df, ["id"])
        twice = merge_upsert(once, upd_df, ["id"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


class TestChangeApplicationProperties:
    @settings(**SETTINGS)
    @given(
        ops=st.lists(
            st.tuples(
                st.integers(0, 5),                       # pk
                st.sampled_from(["insert", "update", "delete"]),
                st.integers(-100, 100),                  # value
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_chunking_independence(self, spark, ops):
        """Applying a change log in one batch == applying it split into
        two batches (change_id order preserved) — micro-batch boundaries
        must not affect the final state."""
        from database_replicator_spark.operators.incremental import apply_change_batch

        changes = [
            (pk, None if op == "delete" else f"n{val}", val, op, i)
            for i, (pk, op, val) in enumerate(ops)
        ]
        schema = "id int, name string, v int, op string, change_id int"
        base = spark.createDataFrame([(99, "base", 0)], "id int, name string, v int")

        all_at_once = apply_change_batch(
            base, spark.createDataFrame(changes, schema), ["id"], version_col="change_id"
        )
        mid = len(changes) // 2
        half = apply_change_batch(
            base, spark.createDataFrame(changes[:mid] or changes[:1], schema), ["id"],
            version_col="change_id",
        )
        split = apply_change_batch(
            half, spark.createDataFrame(changes[mid:] or changes[-1:], schema), ["id"],
            version_col="change_id",
        )
        a = sorted(map(tuple, all_at_once.collect()))
        b = sorted(map(tuple, split.collect()))
        if mid == 0 or mid == len(changes):
            return  # degenerate split
        assert a == b


class TestEscapingProperties:
    @settings(**SETTINGS)
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.sampled_from(list("ab\\\t\n\rxy|")), min_size=0, max_size=12
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_copy_escape_roundtrip(self, spark, texts):
        """COPY text escaping is reversible and collision-free: distinct
        inputs stay distinct, and unescaping restores the original."""
        from database_replicator_spark.functions.render import copy_text_escape_expr

        df = spark.createDataFrame([(t,) for t in texts], "s string")
        rows = df.select("s", copy_text_escape_expr(F.col("s")).alias("e")).collect()
        for r in rows:
            unescaped = (
                r["e"]
                .replace("\\r", "\r")
                .replace("\\n", "\n")
                .replace("\\t", "\t")
                .replace("\\\\", "\\")
            )
            # the escaped form contains no raw control chars
            assert all(c not in r["e"] for c in "\t\n\r")

    @settings(**SETTINGS)
    @given(s=st.text(max_size=20))
    def test_json_string_roundtrip(self, spark, s):
        """json_string fragments always parse back to the original text."""
        from database_replicator_spark.functions.doc_json import json_string

        df = spark.createDataFrame([(s,)], "s string")
        out = df.select(json_string(F.col("s")).alias("j")).collect()[0]["j"]
        assert json.loads(out) == s


asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=100),   # t (seconds)
        st.integers(min_value=0, max_value=999),   # payload id
    ),
    min_size=0, max_size=20,
)
asof_probes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=1, max_size=12,
)


class TestAsofJoinProperties:
    @settings(**{**SETTINGS, "max_examples": 8})
    @given(events=asof_events, probes=asof_probes)
    def test_matches_naive_semantics(self, spark, events, probes):
        """asof_join ≡ 'max-t right row with t <= probe t, ties → max
        tiebreak' computed naively in Python."""
        from datetime import datetime, timezone

        from database_replicator_spark.operators.asof import asof_join

        def ts(s):
            return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(tzinfo=None)

        ev = spark.createDataFrame(
            [(k, ts(t), p) for k, t, p in events] or [(0, ts(0), 0)],
            "k int, ts timestamp, pid int",
        )
        if not events:
            ev = ev.filter(F.lit(False))
        pr = spark.createDataFrame(
            [(k, ts(t)) for k, t in probes], "k int, pts timestamp"
        )
        out = asof_join(
            pr, ev, on=["k"], probe_time="pts", right_time="ts",
            payload_cols=["pid"], tiebreak="pid",
        )
        got = {(r["k"], r["pts"]): r["pid"] for r in out.collect()}

        for k, t in probes:
            cands = [(et, pid) for ek, et, pid in events if ek == k and et <= t]
            want = max(cands)[1] if cands else None
            assert got[(k, ts(t))] == want, (k, t, cands)
        assert out.count() == pr.count()


range_points = st.lists(
    st.integers(min_value=0, max_value=500), min_size=0, max_size=20
)
range_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=0, max_value=120),
    ),
    min_size=0, max_size=8,
)


class TestRangeJoinProperties:
    @settings(**SETTINGS)
    @given(points=range_points, intervals=range_intervals,
           bucket=st.sampled_from([7, 60, 3600]))
    def test_matches_naive_containment(self, spark, points, intervals, bucket):
        """Bucketized range join ≡ naive [start, end) containment for any
        bucket width (bucketing is an optimization, never a semantic)."""
        from datetime import datetime, timezone

        from database_replicator_spark.operators.rangejoin import (
            range_join_intervals,
        )

        def ts(s):
            return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(tzinfo=None)

        pdf = spark.createDataFrame(
            [(i, ts(t)) for i, t in enumerate(points)] or [(0, ts(0))],
            "pid int, ts timestamp",
        )
        if not points:
            pdf = pdf.filter(F.lit(False))
        idf = spark.createDataFrame(
            [(i, ts(s), ts(s + d)) for i, (s, d) in enumerate(intervals)]
            or [(0, ts(0), ts(0))],
            "iid int, w_start timestamp, w_end timestamp",
        )
        if not intervals:
            idf = idf.filter(F.lit(False))
        out = range_join_intervals(
            pdf, idf, point_time="ts", start_col="w_start", end_col="w_end",
            bucket_seconds=bucket,
        )
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        want = sorted(
            (pi, ii)
            for pi, t in enumerate(points)
            for ii, (s, d) in enumerate(intervals)
            if s <= t < s + d
        )
        assert got == want


class TestPackSequencesProperties:
    @settings(**SETTINGS)
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),  # doc_id
                st.sampled_from(["cc", "wiki"]),             # source
                st.integers(min_value=1, max_value=500),     # n_tokens
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        budget=st.integers(min_value=10, max_value=400),
        width=st.sampled_from([1, 7, 64, 4096]),
    )
    def test_range_packing_equals_single_window(self, spark, docs, budget, width):
        """The two-pass range packing must reproduce the single-window
        packing exactly for ANY doc-id distribution, bucket width, and
        budget — including widths that put every doc in its own bucket
        (1) or all docs in one bucket (4096)."""
        from database_replicator_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(docs, "doc_id long, source string, n_tokens int")
        key = ["source", "doc_id"]
        fast = pack_sequences(
            df, budget=budget, part_col="source", range_width=width
        ).orderBy(*key).collect()
        slow = pack_sequences(
            df, budget=budget, part_col="source", range_width=None
        ).orderBy(*key).collect()
        assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


class TestChunkWindowProperties:
    @settings(**SETTINGS)
    @given(
        n_tokens=st.integers(min_value=1, max_value=60),
        budget=st.integers(min_value=2, max_value=12),
        overlap=st.integers(min_value=0, max_value=6),
    )
    def test_windows_cover_every_token_without_gaps(
        self, spark, n_tokens, budget, overlap
    ):
        from database_replicator_spark.operators.corpus import chunk_long_docs

        if overlap >= budget:
            overlap = budget - 1
        text = " ".join(f"t{i}" for i in range(n_tokens))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_long_docs(docs, budget=budget, overlap=overlap).collect(),
            key=lambda r: r["chunk_id"],
        )
        # coverage: every token index in exactly the expected windows
        covered = set()
        prev_start = None
        for r in rows:
            start, ln = r["start_tok"], r["chunk_tokens"]
            assert 1 <= ln <= budget
            assert r["chunk_text"] == " ".join(
                f"t{i}" for i in range(start, start + ln)
            )
            if prev_start is not None:
                assert start - prev_start == budget - overlap
            prev_start = start
            covered.update(range(start, start + ln))
        assert covered == set(range(n_tokens))


class TestDatasetSplitProperties:
    @settings(**SETTINGS)
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40,
            unique=True,
        ),
        seed=st.integers(min_value=0, max_value=9),
    )
    def test_split_total_and_append_stability(self, spark, ids, seed):
        from database_replicator_spark.operators.corpus import dataset_split

        fr = {"train": 0.7, "val": 0.2, "test": 0.1}
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        rows = dataset_split(df, fr, seed=seed).collect()
        assert len(rows) == len(ids)  # exhaustive, no dupes
        by_id = {r["doc_id"]: r["split"] for r in rows}
        # subset invariance: splitting any subset assigns identically
        sub = ids[: max(1, len(ids) // 2)]
        sub_rows = dataset_split(
            spark.createDataFrame([(i,) for i in sub], "doc_id long"), fr, seed=seed
        ).collect()
        for r in sub_rows:
            assert by_id[r["doc_id"]] == r["split"]


class TestFunnelProperties:
    @settings(**SETTINGS)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),    # user
                st.integers(min_value=0, max_value=50),   # second offset
                st.sampled_from(["a", "b", "c"]),         # type
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_step_counts_monotone_and_match_reference(self, spark, events):
        from datetime import datetime, timedelta

        from database_replicator_spark.operators.funnel import funnel_counts

        base = datetime(2024, 1, 1)
        rows = [
            (i, u, base + timedelta(seconds=s), t)
            for i, (u, s, t) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = {
            r["step"]: r["n_users"]
            for r in funnel_counts(df, ["a", "b", "c"]).collect()
        }
        assert out[1] >= out[2] >= out[3]  # funnel never widens
        # reference: per-user greedy min-ts chaining in pure python
        per_user = {}
        for _, u, ts, t in rows:
            per_user.setdefault(u, []).append((ts, t))
        expect = [0, 0, 0]
        for evs in per_user.values():
            last = None
            for si, step in enumerate(["a", "b", "c"]):
                cand = [ts for ts, t in evs if t == step and (last is None or ts > last)]
                if not cand:
                    break
                last = min(cand)
                expect[si] += 1
        assert [out[1], out[2], out[3]] == expect


# --- change feeds for the SCD2 / compaction contracts -----------------------

change_feed = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),          # key
        st.sampled_from(["a", "b", "c"]),               # attribute state
    ),
    min_size=1,
    max_size=24,
)


def _feed_df(spark, feed):
    # unique, monotone timestamps: position in the feed IS the clock
    return spark.createDataFrame(
        [(k, a, i) for i, (k, a) in enumerate(feed)], ["k", "attr", "ts"]
    )


class TestScd2Properties:
    @settings(**SETTINGS)
    @given(feed=change_feed, cut=st.integers(min_value=0, max_value=24))
    def test_incremental_merge_equals_batch_rebuild(self, spark, feed, cut):
        """Folding any suffix of the feed into the history built from the
        prefix must equal building from the whole feed — the invariant that
        makes nightly SCD2 maintenance trustworthy."""
        from database_replicator_spark.operators.scd import (
            scd2_from_changes,
            scd2_merge_batch,
        )

        cut = min(cut, len(feed))
        prefix, suffix = feed[:cut], feed[cut:]
        full = scd2_from_changes(_feed_df(spark, feed), ["k"], ["attr"], "ts")
        if not prefix:
            merged = scd2_from_changes(_feed_df(spark, suffix), ["k"], ["attr"], "ts")
        elif not suffix:
            merged = scd2_from_changes(_feed_df(spark, prefix), ["k"], ["attr"], "ts")
        else:
            hist = scd2_from_changes(_feed_df(spark, prefix), ["k"], ["attr"], "ts")
            batch = spark.createDataFrame(
                [(k, a, cut + i) for i, (k, a) in enumerate(suffix)],
                ["k", "attr", "ts"],
            )
            merged = scd2_merge_batch(hist, batch, ["k"], ["attr"], "ts")
        key = lambda df: sorted(map(tuple, df.collect()))
        assert key(merged) == key(full)

    @settings(**SETTINGS)
    @given(feed=change_feed)
    def test_history_invariants(self, spark, feed):
        """Intervals per key chain without gaps or overlaps; exactly one
        open (current) version per key; versions are 1..n."""
        from database_replicator_spark.operators.scd import scd2_from_changes

        hist = scd2_from_changes(_feed_df(spark, feed), ["k"], ["attr"], "ts")
        by_key = {}
        for r in hist.collect():
            by_key.setdefault(r["k"], []).append(r)
        for rows in by_key.values():
            rows.sort(key=lambda r: r["version"])
            assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
            assert sum(r["is_current"] for r in rows) == 1
            for a, b in zip(rows, rows[1:]):
                assert a["valid_to"] == b["valid_from"]  # gap/overlap-free
                assert a["attr"] != b["attr"]            # genuinely collapsed
            assert rows[-1]["valid_to"] is None


ops_feed = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),                    # key
        st.sampled_from(["insert", "update", "delete"]),          # op
        st.integers(min_value=-99, max_value=99),                 # value
    ),
    min_size=1,
    max_size=20,
)


class TestCompactionProperties:
    @settings(**SETTINGS)
    @given(feed=ops_feed)
    def test_net_apply_equals_sequential_replay(self, spark, feed):
        """For ANY change feed, applying the compacted net batch to any base
        yields the same final state as replaying every change in order."""
        from database_replicator_spark.operators.incremental import (
            apply_change_batch,
            compact_changes,
        )

        base = spark.createDataFrame(
            [(k, float(1000 + k)) for k in (2, 4)], ["k", "v"]
        )
        changes = spark.createDataFrame(
            [(k, op, i, float(v)) for i, (k, op, v) in enumerate(feed)],
            ["k", "op", "version", "v"],
        )
        replayed = apply_change_batch(base, changes, ["k"], version_col="version")
        # apply_change_batch applies inserts as upserts, so the feed may
        # "insert" keys that already exist in base — the upsert-tolerant
        # compaction mode is the one that must match sequential replay
        # (strict mode's emit-nothing is only sound for well-formed CDC
        # feeds; a hypothesis run found exactly this divergence)
        net = compact_changes(
            changes, ["k"], "version", value_cols=["v"], strict_inserts=False
        )
        compacted = apply_change_batch(
            base,
            net.withColumnRenamed("net_op", "op").withColumn("version", F.lit(0)),
            ["k"],
            version_col="version",
        )
        key = lambda df: sorted(map(tuple, df.collect()))
        assert key(replayed) == key(compacted)

    def test_insert_then_delete_of_preexisting_key_regression(self, spark):
        """The hypothesis-found divergence, pinned: key 2 exists in base,
        the feed re-inserts then deletes it. Upsert-tolerant compaction
        must ship a delete (strict mode's emit-nothing leaves the stale
        base row alive under upsert apply semantics)."""
        from database_replicator_spark.operators.incremental import (
            apply_change_batch,
            compact_changes,
        )

        base = spark.createDataFrame([(2, 1002.0), (4, 1004.0)], ["k", "v"])
        changes = spark.createDataFrame(
            [(2, "insert", 0, 0.0), (2, "delete", 1, 0.0)],
            ["k", "op", "version", "v"],
        )
        replayed = apply_change_batch(base, changes, ["k"], version_col="version")
        net = compact_changes(
            changes, ["k"], "version", value_cols=["v"], strict_inserts=False
        )
        assert [r["net_op"] for r in net.collect()] == ["delete"]
        compacted = apply_change_batch(
            base,
            net.withColumnRenamed("net_op", "op").withColumn("version", F.lit(0)),
            ["k"],
            version_col="version",
        )
        assert sorted(map(tuple, replayed.collect())) == sorted(
            map(tuple, compacted.collect())
        ) == [(4, 1004.0)]
        # strict mode documents the precondition: same feed, emit-nothing
        strict = compact_changes(changes, ["k"], "version", value_cols=["v"])
        assert strict.count() == 0

    @settings(**SETTINGS)
    @given(feed=ops_feed, cut=st.integers(min_value=1, max_value=19))
    def test_compaction_never_grows(self, spark, feed, cut):
        """Net rows ≤ touched keys, and compacting slice-compactions equals
        compacting the whole feed (associativity on version order)."""
        from database_replicator_spark.operators.incremental import compact_changes

        changes = spark.createDataFrame(
            [(k, op, i, float(v)) for i, (k, op, v) in enumerate(feed)],
            ["k", "op", "version", "v"],
        )
        net = compact_changes(changes, ["k"], "version", value_cols=["v"])
        assert net.count() <= changes.select("k").distinct().count()

    @settings(**SETTINGS)
    @given(feed=ops_feed, cut=st.integers(min_value=1, max_value=19))
    def test_slicewise_net_apply_equals_full_replay(self, spark, feed, cut):
        """Compacting arbitrary version slices and applying the slice nets
        in order must equal replaying the raw feed — the property that
        makes per-epoch sink compaction safe no matter where sync cycles
        happen to cut the change stream."""
        from database_replicator_spark.operators.incremental import (
            apply_change_batch,
            compact_changes,
        )

        base = spark.createDataFrame(
            [(k, float(1000 + k)) for k in (2, 4)], ["k", "v"]
        )
        changes = spark.createDataFrame(
            [(k, op, i, float(v)) for i, (k, op, v) in enumerate(feed)],
            ["k", "op", "version", "v"],
        )
        replayed = apply_change_batch(base, changes, ["k"], version_col="version")

        state = base
        for lo, hi in ((0, cut), (cut, 10**9)):
            sl = changes.filter(
                (F.col("version") >= lo) & (F.col("version") < hi)
            )
            net = compact_changes(
                sl, ["k"], "version", value_cols=["v"], strict_inserts=False
            )
            state = apply_change_batch(
                state,
                net.withColumnRenamed("net_op", "op").withColumn(
                    "version", F.lit(0)
                ),
                ["k"],
                version_col="version",
            ).localCheckpoint()
        assert sorted(map(tuple, replayed.collect())) == sorted(
            map(tuple, state.collect())
        )


class TestTokenBudgetProperties:
    @settings(**SETTINGS)
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=999),     # score permille
                st.integers(min_value=1, max_value=40),      # tokens
            ),
            min_size=1,
            max_size=25,
            unique_by=lambda t: t,
        ),
        budget=st.integers(min_value=0, max_value=400),
    )
    def test_selection_is_prefix_of_global_order(self, spark, docs, budget):
        from database_replicator_spark.operators.corpus import select_token_budget

        t = spark.createDataFrame(
            [(i, s / 1000.0, n) for i, (s, n) in enumerate(docs)],
            "doc_id long, score double, n_tokens long",
        )
        got = sorted(r["doc_id"] for r in select_token_budget(t, budget).collect())
        # naive reference: inclusive running total over (score desc, id asc)
        order = sorted(
            ((i, s / 1000.0, n) for i, (s, n) in enumerate(docs)),
            key=lambda r: (-r[1], r[0]),
        )
        want, cum = [], 0
        for i, _s, n in order:
            cum += n
            if cum <= budget:
                want.append(i)
            else:
                break
        assert got == sorted(want)


class TestClassifierProperties:
    @settings(**SETTINGS)
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    codec="ascii", categories=("L", "N", "P", "Zs")
                ),
                min_size=0,
                max_size=60,
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_matches_python_reference_on_ascii(self, spark, texts):
        """hashed_linear_score == the pure-python model for any printable
        ASCII input (the contract is scoped to ASCII: JVM `\\s` is
        ASCII-whitespace while Python str.split() is unicode-aware, so
        the cross-engine tokenization contract is ASCII whitespace)."""
        import hashlib

        from database_replicator_spark.operators.textops import (
            classifier_weight,
            hashed_linear_score,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["feat_sum"]
            for r in hashed_linear_score(df, num_buckets=32).collect()
        }
        for i, t in enumerate(texts):
            toks = t.strip().split() or [""]
            want = sum(
                classifier_weight(
                    int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 32, 32
                )
                for tok in toks
            )
            assert got[i] == want, (repr(t), got[i], want)


class TestIntervalJoinProperties:
    @settings(**SETTINGS)
    @given(
        lefts=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # key
                st.integers(min_value=0, max_value=500), # ts offset (s)
            ),
            min_size=0,
            max_size=12,
        ),
        rights=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=500),
            ),
            min_size=0,
            max_size=12,
        ),
    )
    def test_batch_semantics_match_naive(self, spark, lefts, rights):
        """stream_interval_join's condition on batch frames == the naive
        O(n·m) python double loop."""
        import datetime

        from database_replicator_spark.streaming.windows import stream_interval_join

        base = datetime.datetime(2024, 1, 1)
        l_rows = [
            (i, k, base + datetime.timedelta(seconds=s))
            for i, (k, s) in enumerate(lefts)
        ]
        r_rows = [
            (i, k, base + datetime.timedelta(seconds=s))
            for i, (k, s) in enumerate(rights)
        ]
        ldf = spark.createDataFrame(l_rows, "lid long, k long, lts timestamp")
        rdf = spark.createDataFrame(r_rows, "rid long, rk long, rts timestamp")
        got = {
            (r["lid"], r["rid"])
            for r in stream_interval_join(
                ldf, rdf, on=[("k", "rk")], left_ts="lts", right_ts="rts",
                within="2 minutes",
            ).collect()
        }
        want = {
            (li, ri)
            for li, (lk, ls) in enumerate(lefts)
            for ri, (rk, rs) in enumerate(rights)
            if lk == rk and ls <= rs <= ls + 120
        }
        assert got == want


class TestJsonlIngestProperties:
    @settings(**SETTINGS)
    @given(
        lines=st.lists(
            st.one_of(
                # valid doc object
                st.fixed_dictionaries(
                    {"text": st.text(min_size=0, max_size=30)},
                    optional={"lang": st.sampled_from(["en", "de"]),
                              "source": st.text(
                                  alphabet="abc", min_size=1, max_size=3)},
                ),
                # arbitrary junk line (usually invalid JSON)
                st.text(min_size=1, max_size=30).filter(
                    lambda s: "\n" not in s and "\r" not in s
                ),
            ),
            min_size=1,
            max_size=15,
        )
    )
    def test_docs_plus_corrupt_equals_lines(self, spark, tmp_path_factory, lines):
        """Ingestion NEVER silently drops: every input line lands in docs
        or in the corrupt channel, for arbitrary mixes of valid docs,
        empty-text docs, and junk."""
        import json as _json
        import os

        from database_replicator_spark.sources.text_corpus import (
            read_jsonl_documents,
        )

        d = tmp_path_factory.mktemp("jsonl")
        path = os.path.join(str(d), "in.jsonl")
        n_written = 0
        with open(path, "w") as fh:
            for ln in lines:
                if isinstance(ln, dict):
                    fh.write(_json.dumps(ln) + "\n")
                else:
                    fh.write(ln + "\n")
                n_written += 1
        docs, corrupt = read_jsonl_documents(spark, path)
        assert docs.count() + corrupt.count() == n_written
        # docs all carry non-empty text and a deterministic id
        rows = docs.collect()
        assert all(r["text"] for r in rows)
        assert all(r["doc_id"] is not None for r in rows)


class TestRowDiffProperties:
    @settings(**SETTINGS)
    @given(
        src=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
                st.one_of(st.none(), st.sampled_from(["a", "b", ""])),
            ),
            min_size=0, max_size=10, unique_by=lambda t: t[0],
        ),
        tgt=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
                st.one_of(st.none(), st.sampled_from(["a", "b", ""])),
            ),
            min_size=0, max_size=10, unique_by=lambda t: t[0],
        ),
    )
    def test_matches_dict_reference(self, spark, src, tgt):
        """row_diff == the dict-based reference diff for arbitrary keyed
        rows with NULLs and empty strings (the rendering distinguishes
        NULL from '' only through the joint hash — both map to '' in the
        canonical form, so equality follows the rendering, and BOTH sides
        apply it, keeping the classification consistent)."""
        from database_replicator_spark.operators.reconcile import row_diff

        schema = "k long, n long, s string"
        sdf = spark.createDataFrame(src, schema)
        tdf = spark.createDataFrame(tgt, schema)
        got = {
            r["k"]: r["status"] for r in row_diff(sdf, tdf, ["k"]).collect()
        }

        def render(t):
            n, s_ = t[1], t[2]
            return (
                ("" if n is None else str(n)) + "|" + ("" if s_ is None else s_)
            )

        s_map = {t[0]: render(t) for t in src}
        t_map = {t[0]: render(t) for t in tgt}
        want = {}
        for k in set(s_map) | set(t_map):
            if k not in t_map:
                want[k] = "missing_in_target"
            elif k not in s_map:
                want[k] = "extra_in_target"
            elif s_map[k] != t_map[k]:
                want[k] = "mismatch"
        assert got == want


class TestSplitProperties:
    @settings(**SETTINGS)
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1, max_size=30, unique=True,
        ),
        extra=st.lists(
            st.integers(min_value=10_001, max_value=20_000),
            min_size=1, max_size=10, unique=True,
        ),
        seed=st.integers(min_value=0, max_value=3),
    )
    def test_append_stability(self, spark, ids, extra, seed):
        """Adding documents NEVER moves an existing document's split —
        the property that lets a corpus grow without test-set leakage
        (a doc that was ever in test stays in test)."""
        from database_replicator_spark.operators.corpus import dataset_split

        fr = {"train": 0.8, "val": 0.1, "test": 0.1}

        def assign(id_list):
            df = spark.createDataFrame([(i,) for i in id_list], "doc_id long")
            return {
                r["doc_id"]: r["split"]
                for r in dataset_split(df, fr, seed=seed).collect()
            }

        before = assign(ids)
        after = assign(ids + extra)
        assert all(after[i] == before[i] for i in ids)


class TestWinnowingProperties:
    @settings(**SETTINGS)
    @given(
        text=st.text(
            alphabet=st.sampled_from("abcd efg"), min_size=12, max_size=80
        ),
    )
    def test_window_coverage_invariant(self, spark, text):
        """The winnowing guarantee (MOSS): every window of w consecutive
        k-gram positions contributes at least one selected fingerprint —
        i.e. for any w-window over the normalized text's k-gram hash
        sequence, min(window) is among the selected hashes."""
        import hashlib

        from database_replicator_spark.operators.textops import (
            normalize_text_expr,
            winnowing_fingerprints,
        )

        k, w = 5, 4
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        selected = {
            r["fingerprint"]
            for r in winnowing_fingerprints(df, k=k, w=w).collect()
        }
        norm = df.select(
            normalize_text_expr(F.col("text")).alias("n")
        ).collect()[0]["n"]
        # python reference: hash60 of every k-gram (clamped like the SQL:
        # at least one gram even for short docs)
        n_grams = max(len(norm) - (k - 1), 1)
        grams = [norm[i : i + k] for i in range(n_grams)]
        hashes = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        ]
        for i in range(len(hashes)):
            window = hashes[i : i + w]
            assert min(window) in selected, (norm, i)


class TestTokenBudgetProperties:
    @settings(**SETTINGS)
    @given(
        docs=st.lists(
            st.tuples(
                st.floats(min_value=0.0, max_value=1.0,
                          allow_nan=False, width=32),
                st.integers(min_value=1, max_value=40),
            ),
            min_size=1, max_size=20,
        ),
        budget=st.integers(min_value=1, max_value=400),
    )
    def test_matches_sorted_python_reference(self, spark, docs, budget):
        """Two-phase bucketed selection == the naive sort-and-fill python
        reference under arbitrary scores (including exact TIES, broken by
        id) and any budget boundary. Inclusive semantics: a doc is kept
        iff its inclusive running total fits."""
        from database_replicator_spark.operators.corpus import select_token_budget

        rows = [(i, float(s), int(t)) for i, (s, t) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in select_token_budget(df, budget=budget).collect()
        }

        # PREFIX semantics: the running total accumulates over EVERY doc
        # in rank order; once it overflows, everything after is excluded
        # (no skip-and-continue backfilling of smaller later docs) — the
        # contract the auditable cum_tokens column encodes
        ref, cum = {}, 0
        for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += t
            if cum <= budget:
                ref[i] = cum
        assert got == ref

    def test_prefix_not_skip_and_continue(self, spark):
        """The distinguishing case: an overflowing doc mid-ranking BLOCKS
        smaller later docs (prefix), it is not skipped over."""
        from database_replicator_spark.operators.corpus import select_token_budget

        rows = [(0, 0.9, 10), (1, 0.8, 100), (2, 0.7, 5)]
        df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
        got = {
            r["doc_id"] for r in select_token_budget(df, budget=20).collect()
        }
        assert got == {0}  # doc2 would fit under skip-and-continue


class TestCapPerGroupProperties:
    @settings(**SETTINGS)
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),        # id
                st.sampled_from(["a", "b", "c"]),               # group
            ),
            min_size=1, max_size=25, unique_by=lambda t: t[0],
        ),
        cap=st.integers(min_value=1, max_value=6),
        shards=st.sampled_from([None, 4]),
    )
    def test_count_nestedness_and_shard_invariance(self, spark, docs, cap, shards):
        """Per-group kept count = min(group size, cap); the kept set is a
        hash-order prefix, so cap K is a subset of cap K+1; and the
        range-sharded mega-domain path returns the EXACT same selection
        as the single-sort path."""
        from collections import Counter

        from database_replicator_spark.operators.corpus import cap_per_group

        df = spark.createDataFrame(docs, "doc_id long, domain string")
        kept = {
            r["doc_id"]
            for r in cap_per_group(
                df, "domain", cap, range_shards=shards
            ).collect()
        }
        sizes = Counter(g for _, g in docs)
        kept_sizes = Counter(
            g for i, g in docs if i in kept
        )
        for g, n in sizes.items():
            assert kept_sizes[g] == min(n, cap)
        # nested in cap
        kept_next = {
            r["doc_id"]
            for r in cap_per_group(
                df, "domain", cap + 1, range_shards=shards
            ).collect()
        }
        assert kept <= kept_next
        # sharded path identical to unsharded
        other = {
            r["doc_id"]
            for r in cap_per_group(
                df, "domain", cap, range_shards=8 if shards is None else None
            ).collect()
        }
        assert kept == other


class TestTemperatureProperties:
    @settings(**SETTINGS)
    @given(
        counts=st.lists(
            st.integers(min_value=1, max_value=300), min_size=2, max_size=5
        ),
        alpha=st.sampled_from([0.25, 0.5, 0.75]),
    )
    def test_rate_laws(self, spark, counts, alpha):
        """The temperature-rate contract, for any stratum-size mix:
        the smallest stratum keeps everything (rate 1); rates fall
        monotonically with stratum size; effective counts n_d·rate_d are
        proportional to n_d^alpha (the defining XLM-R/mT5 property);
        p_temp sums to 1."""
        from database_replicator_spark.operators.corpus import temperature_rates

        rows = [
            (i * 1000 + j, f"s{i}")
            for i, n in enumerate(counts)
            for j in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {
            r["source"]: r
            for r in temperature_rates(df, "source", alpha=alpha).collect()
        }
        n_min = min(counts)
        sizes = {f"s{i}": n for i, n in enumerate(counts)}
        # smallest stratum keeps everything
        for s, n in sizes.items():
            if n == n_min:
                assert abs(out[s]["rate"] - 1.0) < 1e-9
        # monotone: bigger stratum → smaller (or equal) rate
        by_size = sorted(sizes.items(), key=lambda kv: kv[1])
        for (s1, n1), (s2, n2) in zip(by_size, by_size[1:]):
            if n1 < n2:
                assert out[s1]["rate"] >= out[s2]["rate"] - 1e-12
        # the defining law, checked against the closed form directly:
        # rate_d = (n_min/n_d)^(1-alpha), 6-dp-rounded (so effective
        # counts n_d·rate_d ∝ n_d^alpha); slack covers the rounding
        # quantum plus any libm-vs-JVM pow ulp
        for s, n in sizes.items():
            want = (n_min / n) ** (1 - alpha)
            assert abs(out[s]["rate"] - want) <= 1e-6, (s, out[s]["rate"], want)
        assert abs(sum(r["p_temp"] for r in out.values()) - 1.0) < 1e-4


class TestPqProperties:
    """Algebraic contracts of the PQ/ADC tier against pure-numpy
    references — the encode argmin law, the integer-micros ADC sum, and
    the coverage-sample selection rule."""

    vecs_strategy = st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False),
            min_size=8, max_size=8,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=6, max_size=20, unique_by=lambda v: tuple(v),
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(vecs=vecs_strategy)
    def test_encode_matches_numpy_reference(self, spark, vecs):
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            pq_encode,
            pq_sample_codebooks,
        )

        rows = [(i, v) for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        ksub = min(4, len(vecs))
        books = pq_sample_codebooks(emb, m=4, ksub=ksub)
        got = {
            r["vid"]: list(r["codes"])
            for r in pq_encode(emb, books, round_digits=6).collect()
        }
        mat = np.array(vecs, dtype=np.float64)
        mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        for i, u in enumerate(mat):
            for j in range(4):
                sub = u[j * 2 : (j + 1) * 2]
                d2 = np.round(((sub[None, :] - books[j]) ** 2).sum(axis=1), 6)
                assert got[i][j] == int(d2.argmin())

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(vecs=vecs_strategy)
    def test_adc_micros_score_is_exact_lut_sum(self, spark, vecs):
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            pq_encode,
            pq_sample_codebooks,
            pq_topk,
        )

        rows = [(i, v) for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        ksub = min(4, len(vecs))
        books = pq_sample_codebooks(emb, m=4, ksub=ksub)
        out = pq_topk(
            emb, emb.filter(F.col("vec_id") < 2), k=len(vecs), m=4, ksub=ksub,
            codebooks=books, exact_micros=True,
        ).collect()
        codes = {
            r["vid"]: list(r["codes"])
            for r in pq_encode(emb, books, round_digits=6).collect()
        }
        mat = np.array(vecs, dtype=np.float64)
        mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        for r in out:
            q = mat[r["query_id"]]
            total = 0
            for j in range(4):
                dot = float(q[j * 2 : (j + 1) * 2] @ books[j][codes[r["corpus_id"]][j]])
                total += int(np.rint(np.round(dot, 6) * 1_000_000))
            assert r["score"] == total / 1_000_000

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(vecs=vecs_strategy, per_cell=st.integers(min_value=1, max_value=4),
           seed=st.integers(min_value=0, max_value=3))
    def test_coverage_sample_matches_reference_selection(
        self, spark, vecs, per_cell, seed
    ):
        import hashlib

        import numpy as np

        from database_replicator_spark.operators.similarity import coverage_sample

        rows = [(i, v) for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        nlist = min(4, len(vecs))
        got = {
            (r["vec_id"], r["cid"], r["cell_rank"])
            for r in coverage_sample(
                emb, per_cell=per_cell, nlist=nlist, seed=seed,
                prefilter_buckets=2,
            ).collect()
        }
        # reference: argmax rounded cosine vs lowest-nlist-id units, then
        # per-cell (hash60(f"{seed}:{id}"), id) order
        mat = np.array(vecs, dtype=np.float64)
        mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        cents = mat[:nlist]
        cells = {}
        for i, u in enumerate(mat):
            sims = np.round(cents @ u, 6)
            cid = int(sims.argmax())
            h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
            cells.setdefault(cid, []).append((h, i))
        want = set()
        for cid, members in cells.items():
            for rank, (_h, i) in enumerate(sorted(members)[:per_cell], start=1):
                want.add((i, cid, rank))
        assert got == want


class TestCumsumProperties:
    """The two-phase bucketed cumulative sum must equal the naive window
    for ANY (groups, ids, values) multiset and any bucket count — the
    bucketing partitions the sort, it never approximates."""

    cumsum_rows = st.lists(
        st.tuples(
            # NULL is a real group key (groupBy and partitionBy both
            # keep it) — the distributed path must not drop it (r6
            # advisor finding: plain equi-joins reject NULL keys)
            st.sampled_from(["a", "b", "c", None]),               # group
            st.integers(min_value=0, max_value=40),               # id
            # NULL values exercise both the sentinel order bucket and
            # the SQL sum-NULL-while-all-prefix-NULL composition
            st.one_of(
                st.none(), st.integers(min_value=-100, max_value=100)
            ),                                                    # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),  # unique (group, id) tiebreak
    )

    @settings(**SETTINGS)
    @given(rows=cumsum_rows, buckets=st.sampled_from([1, 3, 17]),
           ascending=st.booleans())
    def test_distributed_equals_naive(self, spark, rows, buckets, ascending):
        from pyspark.sql import Window

        from database_replicator_spark.operators.cumsum import (
            grouped_running_sum,
        )

        df = spark.createDataFrame(rows, "g string, id long, v long")
        fast = grouped_running_sum(
            df, ["g"], "v", "id", buckets=buckets, ascending=ascending,
            mode="distributed",
        )
        w = (
            Window.partitionBy("g")
            .orderBy(
                F.col("v").asc() if ascending else F.col("v").desc(),
                F.col("id").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        slow = df.withColumn("cum", F.sum("v").over(w))
        # None-safe sort key (NULL groups/values are legitimate rows)
        key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
        got = sorted(
            ((r["g"], r["id"], r["cum"]) for r in fast.collect()), key=key
        )
        want = sorted(
            ((r["g"], r["id"], r["cum"]) for r in slow.collect()), key=key
        )
        assert got == want
