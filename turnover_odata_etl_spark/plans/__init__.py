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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 8, per VERDICT r07 item 1 — window arithmetic given
# verbatim there: "9 new + the 32 round-4 rows + 9 stalest round-5
# rows = 50"):
#   - the NINE round-8 registrations activated from plans/roundeight
#     (cap ruling VERDICT r07 "What's missing #1": "the freeze is
#     lifted — register all nine; the cap moves to 191 and freezes
#     there"), gated immediately;
#   - ALL 32 remaining round-4 rows (scripts/staleness.py output,
#     pinned in the r07 verdict): after a green r08 gate the driver
#     freshness floor moves from round 4 to round 5;
#   - 9 round-5 rows. All round-5 rows are equally old in the ledger,
#     so "stalest" is broken by code drift since round 5, exactly as
#     the r07 rotation did: the dedup-operator pair (operators/dedup.py
#     is rewritten THIS round — duplicate_spans de-skew, VERDICT item
#     2), the incremental-agg row (streaming/incremental.py changes
#     THIS round — ADVICE high/low IVM fixes), the two remaining ANN
#     rows (operators/similarity.py drift, r06 tiling), and the
#     e12/e13 family heads as alphabetical-first fillers.
# Next-stalest after this round: the remaining 41 round-5 rows
# (listed by scripts/staleness.py). Round-9 window math, assuming the
# six staged plans/roundnine.py queries get a cap ruling: 6 new + 41
# round-5 + the 3 stalest round-6 rows = 50; the rest of round 6
# rotates in r10.
#
GATED_QUERIES = [
    # round-8 registrations, gated immediately (registry 182 -> 191,
    # then frozen per the r07 cap ruling)
    "m_gif_decode_features",
    "m_g711_decode_features",
    "m_flac_decode_features",
    "m_tiff_decode_features",
    "m_mixed_image_decode_features",
    "s_snapshot_pruned_read",
    "s_snapshot_changes",
    "s_snapshot_incremental_agg",
    "d_exact_substr_spans",
    # all 32 round-4 rows (freshness floor -> round 5)
    "c_snapshot_diff",
    "e12_json_extract",
    "e13_approx_aggs",
    "e13_exact_percentiles",
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
    "o_sort_limit",
    "p_rename_coalesce_reorder",
    "q_sql_lateral_join",
    "q_sql_recursive_cte",
    "s_csv_roundtrip",
    "st_session_window",
    "st_stream_dedup_watermark",
    "st_stream_stream_join",
    "st_tumbling_window",
    "u_union_by_name",
    "x_string_functions",
    # 9 round-5 rows with the most code drift since their row
    "d_embedding_neardup",
    "d_prefix_filter_jaccard",
    "st_incremental_agg",
    "s_knn_ivf",
    "s_knn_pq",
    "e12_from_json",
    "e12_variant_extract",
    "e13_bitmap_presence",
    "e13_cms_heavy_hitters",
]

registry.promote(GATED_QUERIES)
