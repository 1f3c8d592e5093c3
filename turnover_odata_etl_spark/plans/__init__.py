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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 12 — the r11 verdict's cap ruling: "register both
# staged round-11 queries; cap moves 204 → 206, then frozen again").
# The ruling's named window:
#   - the 2 new round-11 registrations (gate-now-or-never:
#     t_langid_confusion, s_snapshot_dml_lifecycle);
#   - the 4 round-7 freshness-floor rows held back last round
#     (x_datetime_functions, x_odata_date_roundtrip,
#     e15_udtf_split_words, e7_intersect) — the oldest evidence in
#     the ledger, two of which guard the date-decode divergence story;
#   - 44 of the 50 round-8 rows (scripts/staleness.py). All 50 are
#     equally old in the ledger; the six held back for the round-13
#     rotation are pure JSON/sketch SQL sweeps whose code has not
#     drifted since round 8 (e12_from_json, e12_json_extract,
#     e12_variant_extract, e13_approx_aggs, e13_bitmap_presence,
#     e13_exact_percentiles), while rows riding this round's edited
#     files (storage/snapshot.py: c_snapshot_diff, s_snapshot_*,
#     st_incremental_agg) all keep their slots.
# Next-stalest after this round: those 6 round-8 rows + the round-9
# rows (scripts/staleness.py). Registry is FROZEN at 206 per the r11
# ruling; future registrations only for queries that are the sole
# oracle coverage of a new SURVEY row.
#
GATED_QUERIES = [
    # the two round-11 registrations (cap ruling executed round 12)
    "t_langid_confusion",
    "s_snapshot_dml_lifecycle",
    # the four round-7 freshness-floor rows
    "x_datetime_functions",
    "x_odata_date_roundtrip",
    "e15_udtf_split_words",
    "e7_intersect",
    # 44 of the 50 stalest round-8 rows (held back for r13:
    # e12_from_json, e12_json_extract, e12_variant_extract,
    # e13_approx_aggs, e13_bitmap_presence, e13_exact_percentiles)
    "c_snapshot_diff",
    "d_embedding_neardup",
    "d_exact_substr_spans",
    "d_prefix_filter_jaccard",
    "e13_cms_heavy_hitters",
    "e13_outliers_iqr",
    "e14_funnel_sequence",
    "e14_peak_concurrency",
    "e14_retention_cohorts",
    "e1_pricing_summary",
    "e2_rollup",
    "e3_join_inner",
    "e3_star_join_revenue",
    "e4_spatial_grid_join",
    "e5_window_ranks",
    "e6_copurchase_pairs",
    "e6_q13_customer_distribution",
    "e6_q21_suppliers_kept_waiting",
    "e6_q22_global_sales_opportunity",
    "e6_q6_forecast_revenue",
    "e6_topk_per_group",
    "f_eq_predicate",
    "m_flac_decode_features",
    "m_g711_decode_features",
    "m_gif_decode_features",
    "m_mixed_image_decode_features",
    "m_tiff_decode_features",
    "o_sort_limit",
    "p_rename_coalesce_reorder",
    "q_sql_lateral_join",
    "q_sql_recursive_cte",
    "s_csv_roundtrip",
    "s_knn_ivf",
    "s_knn_pq",
    "s_snapshot_changes",
    "s_snapshot_incremental_agg",
    "s_snapshot_pruned_read",
    "st_incremental_agg",
    "st_session_window",
    "st_stream_dedup_watermark",
    "st_stream_stream_join",
    "st_tumbling_window",
    "u_union_by_name",
    "x_string_functions",
]

registry.promote(GATED_QUERIES)
