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
from . import roundthirteen  # noqa: E402,F401

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 14 — the r13 verdict's cap ruling: "REGISTER all
# four staged round-13 queries ... cap moves 211 → 215, then the
# registry is frozen again"). The ruling's named window:
#   - the 4 new round-13 registrations (gate-now-or-never:
#     s_snapshot_agg_stats, s_snapshot_bloom_pruned_delete,
#     s_join_cobucketed, s_snapshot_history);
#   - the 11 round-9 freshness-floor rows held back last round —
#     the oldest evidence in the ledger;
#   - 35 of the 50 round-10 rows (scripts/staleness.py). The fifteen
#     held back for the round-15 rotation are pure-SQL sweeps,
#     pivot/cube shapes, and window-function batteries whose code has
#     not drifted since round 10 (e1_conditional_agg, e1_pivot,
#     e1_unpivot, e2_cube, e2_grouping_sets, e5_window_distribution,
#     e5_window_lag_lead, e5_window_ntile_nth, e5_window_running_sum,
#     e7_except, q_sql_exists_subquery, x_array_functions,
#     x_bitwise_functions, x_math_functions, x_null_conditional),
#     while rows riding this round's edited files
#     (storage/snapshot.py, operators/similarity.py,
#     operators/cobucket.py: s_snapshot_lifecycle,
#     s_snapshot_skipping, st_snapshot_ivm, d_incremental_neardup,
#     d_semdedup_kmeans, s_knn_lsh, c_merge_upsert and the rest) all
#     keep their slots.
# Next-stalest after this round: those 15 round-10 rows + the
# round-11 rows (scripts/staleness.py). Registry is FROZEN at 215 per
# the r13 ruling; future registrations only for queries that are the
# sole oracle coverage of a new SURVEY row.
#
GATED_QUERIES = [
    # the four round-13 registrations (cap ruling executed round 14)
    "s_snapshot_agg_stats",
    "s_snapshot_bloom_pruned_delete",
    "s_join_cobucketed",
    "s_snapshot_history",
    # the eleven round-9 freshness-floor rows (held back in r13)
    "x_hof_functions",
    "x_try_functions",
    "x_url_functions",
    "e13_corr_regression",
    "e13_histogram",
    "e14_gapfill_resample",
    "e14_inactivity_gaps",
    "e14_ohlc_bars",
    "e5_window_range_frame",
    "e6_q12_priority_by_returnflag",
    "e6_q4_order_priority",
    # 35 of the 50 stalest round-10 rows (the 15 held back for r15
    # are named in the rotation comment above)
    "c_merge_upsert",
    "d_exact_substr_clean",
    "d_incremental_neardup",
    "d_semdedup_kmeans",
    "e13_exact_distinct",
    "e13_percentiles",
    "e14_sessionize_batch",
    "e1_salted_agg",
    "e3_join_bucketed_colocated",
    "e3_join_cross",
    "e3_join_full_outer",
    "e3_join_right",
    "g_triangle_count",
    "m_avi_decode_features",
    "m_embed_quantize",
    "m_jpeg_decode_features",
    "s_gzip_jsonl_roundtrip",
    "s_jsonl_roundtrip",
    "s_knn_lsh",
    "s_odata_delta_sync",
    "s_partitioned_scan_prune",
    "s_snapshot_lifecycle",
    "s_snapshot_skipping",
    "s_warc_ingest",
    "st_snapshot_ivm",
    "st_stateful_user_agg",
    "st_stream_dedup",
    "t_bpe_apply",
    "t_bpe_tokens",
    "t_bpe_train",
    "t_byte_entropy",
    "t_chunk_documents",
    "t_hash_split",
    "t_stratified_sample",
    "x_regex_hash_functions",
]

registry.promote(GATED_QUERIES)
