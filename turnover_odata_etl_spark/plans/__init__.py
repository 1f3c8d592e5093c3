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
from . import roundfourteen  # noqa: E402,F401

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 15 — the r14 verdict's cap ruling: "REGISTER all
# three staged round-14 queries ... cap moves 215 → 218, then the
# registry is frozen again"). The ruling's named window:
#   - the 3 new round-14 registrations (gate-now-or-never:
#     s_snapshot_dv_delete, s_knn_ivf_refresh,
#     s_snapshot_wap_publish);
#   - the 15 round-10 rows held back last round — the oldest
#     evidence left in the ledger (pure-SQL sweeps, pivot/cube
#     shapes, window batteries);
#   - 32 of the 50 round-11 rows (scripts/staleness.py). The
#     eighteen held back for the round-16 rotation are static
#     pure-SQL/join/window shapes whose code has not drifted since
#     round 11 (a_count_rows, a_distinct_sorted, c3_empty_relation,
#     e13_hll_sketch_rollup, e1_string_agg_ordered, e3_join_anti,
#     e3_join_left, e4_asof_join, e4_range_join,
#     e6_q14_promo_revenue, e6_q19_disjunctive_join,
#     e6_q5_local_supplier_volume, f_notnull_nonempty, g_pagerank,
#     p_stringify_nested, q_sql_correlated_subquery,
#     semi_join_orchestration, x_struct_functions), while rows
#     riding this round's edited files (storage/snapshot.py,
#     storage/group.py, operators/similarity.py, operators/langid.py
#     adjacents: s_snapshot_append_compact, st_snapshot_merge,
#     st_incremental_cdc/upsert, s_knn_bruteforce/tiled,
#     d_semantic_dedup, d_semdedup_incremental, t_lang_quality and
#     the rest) all keep their slots.
# Next-stalest after this round: those 18 round-11 rows + the
# round-12 rows (scripts/staleness.py). Registry is FROZEN at 218
# per the r14 ruling; future registrations only for queries that are
# the sole oracle coverage of a new SURVEY row.
#
GATED_QUERIES = [
    # the three round-14 registrations (cap ruling executed round 15)
    "s_snapshot_dv_delete",
    "s_knn_ivf_refresh",
    "s_snapshot_wap_publish",
    # the fifteen round-10 rows held back in r14 (freshness floor)
    "e1_conditional_agg",
    "e1_pivot",
    "e1_unpivot",
    "e2_cube",
    "e2_grouping_sets",
    "e5_window_distribution",
    "e5_window_lag_lead",
    "e5_window_ntile_nth",
    "e5_window_running_sum",
    "e7_except",
    "q_sql_exists_subquery",
    "x_array_functions",
    "x_bitwise_functions",
    "x_math_functions",
    "x_null_conditional",
    # 32 of the 50 stalest round-11 rows (the 18 held back for r16
    # are named in the rotation comment above)
    "d_dedup_clusters",
    "d_fingerprint_dedup",
    "d_minhash_lsh_neardup",
    "d_ngram_jaccard",
    "d_semantic_dedup",
    "d_semdedup_incremental",
    "flagship_turnover",
    "m_adpcm_decode_features",
    "m_binary_features",
    "m_image_decode_features",
    "m_png_adam7_decode_features",
    "p_expectations",
    "p_heavy_hitters",
    "p_profile_table",
    "s_knn_bruteforce",
    "s_knn_tiled",
    "s_snapshot_append_compact",
    "st_incremental_cdc",
    "st_incremental_upsert",
    "st_snapshot_merge",
    "st_stream_static_join",
    "t_bpe_tokenize_ids",
    "t_corpus_mixture",
    "t_decontaminate",
    "t_domain_balanced_sample",
    "t_dsir_importance",
    "t_lang_quality",
    "t_pii_redact",
    "t_quality_filter_c4",
    "t_sequence_pack",
    "t_text_stats",
    "t_tfidf_topterms",
]

registry.promote(GATED_QUERIES)
