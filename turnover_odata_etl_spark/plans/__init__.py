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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. Cumulative driver history (rounds 1-5)
# confirmed 142 of the 174 queries registered through round 5; every
# query NOT in this round's window keeps its local safety net via
# tests/test_oracle_parity (all specs, every session).
#
# ROTATION (round 6, per VERDICT r05 item 1 — close the ledger):
#   - ALL 33 queries with no driver CORRECTNESS row in rounds 1-5
#     (computed from the CORRECTNESS_r0*.json artifacts: the 29
#     long-tail holdovers, the three round-5 late registrations
#     s_gzip_jsonl_roundtrip / s_warc_ingest / t_bpe_train, and
#     m_jpeg_decode_features — STAGED in round 5, registered this
#     round, registry 174 -> 175);
#   - this round's new registrations (appended as they land:
#     t_bpe_apply, s_warc_to_pretrain, d_phash_neardup), gated
#     immediately per the round-5 convention;
#   - the remaining slots refresh the STALEST greens — 14 of the 15
#     queries whose only driver row is round 1, so no green is older
#     than its code by more than a few rounds (a_count_rows sits out:
#     trivial count, implicitly exercised by every other row).
# After a green r06 gate, every registered query has at least one
# driver CORRECTNESS row — the ledger this build has been walking
# toward since round 1 closes.
#
# Round 7 should REGISTER queries STAGED in plans/roundseven.py
# (m_png_adam7_decode_features, m_adpcm_decode_features,
# t_bpe_tokenize_ids — all oracle-green at sf0.001+0.01 via
# tests/test_roundseven.py; held out only so this window keeps its
# exact ledger-closing composition; see that module's cap note for
# which two fit the ≤180 guidance) and gate them immediately, plus
# refresh the next-stalest greens (the remaining round-1/2 rows:
# a_count_rows, e1_string_agg_ordered, e3_join_anti, e3_join_left,
# e4_range_join, e7_intersect, q_sql_correlated_subquery,
# t_text_stats, x_datetime_functions).
#
GATED_QUERIES = [
    # never driver-audited (rounds 1-5) — closes the ledger
    "d_rollhash_fingerprint",
    "t_bpe_tokens",
    "d_simhash_neardup",
    "e1_salted_agg",
    "d_simhash",
    "s_knn_lsh",
    "t_hash_split",
    "t_stratified_sample",
    "d_levenshtein_blocked",
    "t_corpus_pipeline",
    "t_bpe_train",
    "st_stateful_user_agg",
    "st_stream_dedup",
    "e14_sessionize_batch",
    "s_partitioned_scan_prune",
    "e3_join_bucketed_colocated",
    "a_dedup_keep_latest",
    "c_merge_upsert",
    "x_math_functions",
    "x_array_functions",
    "s_jsonl_roundtrip",
    "s_gzip_jsonl_roundtrip",
    "s_warc_ingest",
    "t_chunk_documents",
    "m_embed_quantize",
    "q_sql_exists_subquery",
    "x_regex_hash_functions",
    "x_struct_functions",
    "e3_join_cross",
    "x_null_conditional",
    "x_bitwise_functions",
    "e5_window_ntile_nth",
    "m_jpeg_decode_features",
    # round-6 registrations, gated immediately
    "t_bpe_apply",
    "s_warc_to_pretrain",
    "d_phash_neardup",
    # stalest greens: 14 of the 15 round-1-only rows refreshed
    "a_dedup_rows",
    "e13_exact_distinct",
    "e13_percentiles",
    "e1_conditional_agg",
    "e1_pivot",
    "e1_unpivot",
    "e2_cube",
    "e2_grouping_sets",
    "e3_join_full_outer",
    "e3_join_right",
    "e5_window_distribution",
    "e5_window_lag_lead",
    "e5_window_running_sum",
    "e7_except",
]

registry.promote(GATED_QUERIES)
