"""Regenerate PLANS.md: formatted physical plans of representative queries
so plan shapes (pushdown, broadcast, partial agg, exchanges) are reviewable
without running Spark. Usage: python tools/dump_plans.py"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

REPRESENTATIVE = [
    "filtered_copy_lineitem",      # pushdown + pruning
    "pricing_summary",             # partial/final agg
    "regional_customer_volume",    # broadcast dimension chain
    "reconcile_orphans",           # anti-join
    "merge_upsert_orders",         # MERGE as full-outer coalesce
    "latest_events_per_user",      # window dedup
    "dedup_minhash_lsh",           # shingle → signature → band join
    "dedup_lsh_verified",          # candidates prune BEFORE the pair join
    "embedding_neardup_pairs",     # BLAS mapInPandas
    "embedding_neardup_lsh",       # bucket-keyed applyInPandas BLAS
    "doc_winnowing_fingerprints",  # spread_by fan-out + per-doc window
    "corpus_top_ngrams",           # TakeOrdered, no global sort
    "doc_pack_sequences",          # two-pass range packing
    "dedup_incremental",           # delta-vs-index band join
    "decontaminate_overlap",       # broadcast bench side, NO corpus cache
    "doc_domain_caps",             # per-group hash-ordered cap window
    "doc_unigram_logprob",         # token vocab join + decimal-exact sums
    "similarity_lsh_topk_mt",      # multi-table ∪ multiprobe + pair dedup
    "decontaminate_semantic",      # cross-table bucket join, bench broadcast
    "corpus_temperature_sample",   # in-plan derived rates, broadcast thresholds
    "doc_dsir_weights",            # two-LM token join, decimal-exact ratios
    "events_funnel",               # staged min-ts chaining, no sequences
    "events_retention_cohorts",    # (user,week) distinct before joins
    "doc_bpe_segment",             # merge chain on DISTINCT words, join back
    "orders_zorder_keys",          # pure-map Morton keys, no sampling
    "events_rolling_anomaly",      # decimal-exact window moments
    "scd2_user_event_history",     # two key-partitioned windows, one shuffle
    "ivm_pricing_merge",           # partial-agg states unioned then merged
    "doc_duplicate_spans",         # gram explode; groupBy+join share the key
    "corpus_token_budget",         # per-bucket cumsum + broadcast offsets
    "changes_net_effect",          # min_by/max_by single groupBy, no window
    "events_gapfill",              # generated hour spine, broadcast to types
    "order_priority_exists",       # EXISTS → left-semi with residual inequality
    "late_supplier_blame",         # correlated EXISTS + NOT EXISTS, both non-equi
    "nation_volume_shipping",      # two-alias dims, single fact-fact shuffle
    "part_value_concentration",    # scalar-subquery threshold as 1-row broadcast
    "doc_classifier_score",        # plan-literal weights, zero-shuffle HOF fold
    "order_grouping_sets",         # Expand operator over one shuffle
    "row_diff_orders",             # (pk, hash)-only full-outer divergence join
    "corpus_source_stats",         # per-source composition + exact percentile
    "forecast_revenue_change",     # q6: all predicates at the scan, no joins
    "dominant_part_suppliers",     # q20: decorrelated pair-vs-total aggregate
    "similarity_pq_topk",          # ADC over the codes table, int-micros sums
    "similarity_ivfpq_topk",       # probed-cell join prunes the ADC scan
    "embedding_coverage_sample",   # bucket-prefilter bounded per-cell windows
    "embedding_hard_negatives",    # label-filtered scan before the top-k cut
    "sample_weighted",             # hash race + bounded two-stage top-n
    "doc_hashed_embedding",        # explode → integer sums → map assembly
    "embedding_outliers",          # broadcast-centroid map, zero shuffles
    "nation_customer_pareto",      # integer-units cumsum window per nation
    "part_brand_supplier_hhi",     # broadcast dim + two map-combined aggs
    "shipping_delay_quantiles",    # positional quantiles, one join + window
    "part_type_affinity",          # order-keyed pair self-join, bounded fan-out
    "events_dau_stickiness",       # two distinct-aggs + broadcast week join
    "embedding_matryoshka_topk",   # prefix-slice projection into BLAS top-k
    "doc_ngram_novelty",           # shingle-keyed min + same-keyed join back
    "orders_cohort_ltv",           # custkey agg + join + cohort-cell agg
    "similarity_sq8_topk",         # byte-code scan + candidate-cut window
    "similarity_ivfsq_topk",       # probed cells, pure-JVM reconstruct dot
    "events_activity_gini",        # global bucketed ranks + scalar agg
    "corpus_source_overlap",       # per-source union minhash + S×S broadcast
    "events_heavy_hitters_cms",    # key pre-agg → d-way fanout → ≤256 cells
    "orders_bloom_prefilter",      # KB bit-array broadcast, map-only probe
    "supplier_balance_outliers",   # chained positional medians, one sizing
    "part_size_price_corr",        # exact sufficient stats, pure codegen agg
    "embedding_semantic_dedup",    # map-only assign, ONE cid shuffle, per-cell BLAS
    "doc_quality_threshold_sweep", # bin once + cumulate over ≤10 bins, no fanout
    "corpus_attrition_funnel",     # map-side tier flags, fp-keyed dedup join
    "embedding_matryoshka_rerank", # prefix candidate-cut scan + join-local rescore
    "doc_bm25_topk",               # broadcast query vocab, integer-units rank, pre-cut
    "doc_ql_dirichlet_topk",       # three-part fixed-point QL, broadcast scalars
    "hybrid_rrf3_topk",            # shared tf/dl checkpoint, 3-way outer fuse
    "doc_duplicate_span_merge",    # two gram tiers ∪, per-doc islands window
    "part_copurchase_pagerank",    # checkpointed half-edges, 3 Pregel rounds
    "part_copurchase_ppr",         # seed-flag left join, seed-only teleport
    "part_copurchase_pagerank_weighted",  # (r·w) div Σw proportional split
    "supplier_customer_hits",      # 2×(edge⋈value + keyed agg) per iteration
    "doc_tfidf_cosine_topk",       # full-vocab df for norms, int match/norm sums
    "doc_ql_jm_topk",              # two-part JM decomposition, no length join
    "hybrid_rrf_weighted_topk",    # 2:1 integer-weighted fuse over shared stats
    "doc_bm25_prf_topk",           # two-pass PRF: rank→expand→re-rank, one stats build
    "orders_kll_quantiles",        # Arrow partial sketches → 1-task bounded merge
    "doc_phrase_window_topk",      # positional postings, all-integer proximity
    "multimodal_bmp_phash_dedup",  # real-BMP Arrow decode → codegen dHash → band join
    "doc_entity_linkage",          # block-key equi-join, thresholded levenshtein
    "events_ohlc_bars",            # two windows + groupBy on ONE shuffle key
    "cdc_replay_asof_vs_final",    # epoch-pruned log window + bucketed _latest read
    "doc_late_interaction_topk",   # maxsim: prefilter cut, broadcast q-tokens, int dots
]


def main() -> None:
    from database_replicator_spark import queries as q
    from database_replicator_spark.session import build_session

    spark = build_session("dump_plans")
    out = ["# PLANS — formatted physical plans (sf0.01)\n"]
    out.append(
        "Generated by tools/dump_plans.py. What to look for: `PushedFilters`"
        " on scans, `BroadcastHashJoin` for dimensions, two-level"
        " `HashAggregate` (partial→final), `ArrowEvalPython`/`MapInPandas`"
        " only on the dense-vector ops.\n"
    )
    for name in REPRESENTATIVE:
        df = q.all_queries()[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md with {len(REPRESENTATIVE)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
