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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 7, per VERDICT r06 item 1):
#   - the three round-7 registrations activated from plans/roundseven
#     (m_png_adam7_decode_features, m_adpcm_decode_features,
#     t_bpe_tokenize_ids — cap ruling VERDICT r06 "What's wrong #3":
#     registry moves to 181), gated immediately, PLUS st_snapshot_merge:
#     VERDICT r06 item 3's Done criterion explicitly requires the
#     snapshot-commit capability "registered + gated green", which we
#     read as overriding the same verdict's 181 freeze for exactly this
#     one query (registry 182; anything further needs a new ruling);
#   - ALL remaining round-1/2-only greens (a_count_rows — its round-6
#     sit-out repaid — plus the 8 round-2 rows), then ALL 19 round-3
#     rows: after a green r07 gate no driver row predates round 4;
#   - the last 19 slots refresh the round-4 greens whose underlying
#     modules drifted most since round 4: the plans/llm.py curation
#     family (Generate-boundary rewrite, r06), the dedup/similarity
#     operator families (shared banding engine + tiled-GEMM changes,
#     r05/r06), the incremental-streaming family (snapshot-commit
#     upgrade, THIS round), multimodal decode, and the two core
#     reference-parity queries (flagship_turnover,
#     semi_join_orchestration).
# Next-stalest after this round: the remaining 31 round-4 rows
# (listed by scripts/staleness.py; rotate them in r08).
#
# Round 8 should consider REGISTERING the queries STAGED in
# plans/roundeight.py (m_gif_decode_features — the only end-to-end
# exercise of the round-7 GIF/LZW codec — and s_snapshot_pruned_read
# — the only exercise of the manifest-stat pruned point lookup; both
# oracle-green at sf0.001+0.01 via tests/test_roundeight.py), IF the
# round-7 verdict re-ups the 182 cap; activation checklist in that
# module's docstring.
#
GATED_QUERIES = [
    # round-7 registrations, gated immediately (registry 178 -> 182)
    "m_png_adam7_decode_features",
    "m_adpcm_decode_features",
    "t_bpe_tokenize_ids",
    "st_snapshot_merge",
    # last round-1/2-only greens (ledger freshness floor -> round 3)
    "a_count_rows",
    "e1_string_agg_ordered",
    "e3_join_anti",
    "e3_join_left",
    "e4_range_join",
    "e7_intersect",
    "q_sql_correlated_subquery",
    "t_text_stats",
    "x_datetime_functions",
    # all 19 round-3 rows (freshness floor -> round 4)
    "a_distinct_sorted",
    "c3_empty_relation",
    "d_dedup_clusters",
    "d_fingerprint_dedup",
    "e13_hll_sketch_rollup",
    "e6_q14_promo_revenue",
    "e6_q19_disjunctive_join",
    "e6_q5_local_supplier_volume",
    "f_notnull_nonempty",
    "m_binary_features",
    "p_expectations",
    "p_heavy_hitters",
    "p_stringify_nested",
    "s_knn_bruteforce",
    "st_stream_static_join",
    "t_domain_balanced_sample",
    "t_lang_quality",
    "t_pii_redact",
    "x_odata_date_roundtrip",
    # round-4 greens with the most code drift since their row
    "flagship_turnover",
    "semi_join_orchestration",
    "t_decontaminate",
    "t_sequence_pack",
    "t_quality_filter_c4",
    "t_corpus_mixture",
    "t_tfidf_topterms",
    "d_minhash_lsh_neardup",
    "d_ngram_jaccard",
    "d_semantic_dedup",
    "s_knn_tiled",
    "st_incremental_upsert",
    "st_incremental_cdc",
    "m_image_decode_features",
    "e15_udtf_split_words",
    "p_profile_table",
    "g_pagerank",
    "e4_asof_join",
]

registry.promote(GATED_QUERIES)
