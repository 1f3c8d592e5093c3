"""Query-plan inventory.

Importing this package populates :mod:`.registry` with every declared
query. ``__spark_entry__.py`` exposes the registry to the driver.
"""

from . import registry  # noqa: F401

# Each module registers its queries at import time.
from . import reference  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import streaming_plans  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import roundsix  # noqa: E402,F401
from . import roundseven  # noqa: E402,F401
from . import roundeight  # noqa: E402,F401
from . import roundnine  # noqa: E402,F401
from . import roundten  # noqa: E402,F401
from . import roundeleven  # noqa: E402,F401
from . import roundtwelve  # noqa: E402,F401

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 13 — the r12 verdict's cap ruling: "register all
# five staged round-12 queries; cap moves 206 → 211, then frozen
# again"). The ruling's named window:
#   - the 5 new round-12 registrations (gate-now-or-never:
#     t_bm25_topk, s_knn_ivf_persistent, s_bm25_incremental,
#     s_snapshot_zorder_skipping, s_snapshot_merge_into);
#   - the 6 round-8 freshness-floor rows held back last round
#     (e12_from_json, e12_json_extract, e12_variant_extract,
#     e13_approx_aggs, e13_bitmap_presence, e13_exact_percentiles) —
#     the oldest evidence in the ledger;
#   - 39 of the 50 round-9 rows (scripts/staleness.py). The eleven
#     held back for the round-14 rotation are pure-SQL sweeps and
#     windowed aggregates whose code has not drifted since round 9
#     (x_hof_functions, x_try_functions, x_url_functions,
#     e13_corr_regression, e13_histogram, e14_gapfill_resample,
#     e14_inactivity_gaps, e14_ohlc_bars, e5_window_range_frame,
#     e6_q12_priority_by_returnflag, e6_q4_order_priority), while
#     rows riding this round's edited files (storage/snapshot.py,
#     operators/similarity.py, operators/retrieval.py: s_*_layout,
#     s_compaction_roundtrip, s_schema_evolution_merge, d_* dedup,
#     decoder and streaming rows) all keep their slots.
# Next-stalest after this round: those 11 round-9 rows + the round-10
# rows (scripts/staleness.py). Registry is FROZEN at 211 per the r12
# ruling; future registrations only for queries that are the sole
# oracle coverage of a new SURVEY row.
#
GATED_QUERIES = [
    # the five round-12 registrations (cap ruling executed round 13)
    "t_bm25_topk",
    "s_knn_ivf_persistent",
    "s_bm25_incremental",
    "s_snapshot_zorder_skipping",
    "s_snapshot_merge_into",
    # the six round-8 freshness-floor rows
    "e12_from_json",
    "e12_json_extract",
    "e12_variant_extract",
    "e13_approx_aggs",
    "e13_bitmap_presence",
    "e13_exact_percentiles",
    # 39 of the 50 stalest round-9 rows (held back for r14:
    # x_hof_functions, x_try_functions, x_url_functions,
    # e13_corr_regression, e13_histogram, e14_gapfill_resample,
    # e14_inactivity_gaps, e14_ohlc_bars, e5_window_range_frame,
    # e6_q12_priority_by_returnflag, e6_q4_order_priority)
    "a_dedup_keep_latest",
    "a_dedup_rows",
    "d_levenshtein_blocked",
    "d_phash_neardup",
    "d_rollhash_fingerprint",
    "d_simhash",
    "d_simhash_neardup",
    "e3_join_salted_skew",
    "e4_scd2_intervals",
    "e6_q10_returned_items",
    "e6_q11_important_stock",
    "e6_q15_top_supplier",
    "e6_q16_part_supplier_counts",
    "e6_q17_small_qty_revenue",
    "e6_q18_large_volume_customer",
    "e6_q20_promotion_suppliers",
    "e6_q2_min_cost_supplier",
    "e6_q3_shipping_priority",
    "e6_q7_volume_shipping",
    "e6_q8_market_share",
    "e6_q9_product_profit",
    "m_frame_sample",
    "m_png_decode_features",
    "m_wav_decode_features",
    "s_compaction_roundtrip",
    "s_orc_roundtrip",
    "s_range_sorted_layout",
    "s_schema_evolution_merge",
    "s_warc_to_pretrain",
    "s_xml_roundtrip",
    "s_zorder_layout",
    "st_sliding_window",
    "st_stream_scd2_enrich",
    "st_stream_stream_left_join",
    "t_corpus_pipeline",
    "t_pretrain_pipeline",
    "t_repetition_metrics",
    "t_unigram_logprob",
    "t_weighted_sample_es",
]

registry.promote(GATED_QUERIES)
