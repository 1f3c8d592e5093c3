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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. The cumulative driver ledger CLOSED in
# round 6: the union of CORRECTNESS_r01..r06 covers all 178 queries
# registered through round 6 with latest-status green, so from round 7
# on the window is pure freshness rotation (new registrations gated
# immediately + the stalest greens). Every query NOT in this round's
# window keeps its local safety net via tests/test_oracle_parity (all
# specs, every session).
#
# ROTATION (round 10 — the r09 verdict's cap ruling: "register all
# ten; the cap moves to 201 and freezes there"). The ten
# plans/roundnine.py queries are registered this round (two rounds of
# staged oracle runs + bench history behind them) and gated
# immediately, exactly as the r08 activation did for roundeight:
#   - the 10 new round-9/10 registrations (gate-now-or-never: new
#     registrations always take window slots in their first round);
#   - the 40 stalest round-6 rows (scripts/staleness.py lists 41;
#     after a green r09 gate the driver freshness floor moved to
#     round 6). All 41 are equally old in the ledger; the one held
#     back for the round-11 rotation is x_struct_functions — a pure
#     plans/advanced.py SQL-function sweep whose code has not drifted
#     since its round-6 row, while rows riding this round's edited
#     files (operators/dedup.py, operators/similarity.py,
#     storage/snapshot.py: s_knn_lsh, m_embed_quantize,
#     c_merge_upsert) all keep their slots.
# Next-stalest after this round: x_struct_functions + the 50 round-7
# rows (scripts/staleness.py). Registry is FROZEN at 201 per the r09
# ruling; future windows are pure freshness rotation.
#
GATED_QUERIES = [
    # the ten round-9 registrations (cap ruling executed round 10)
    "m_avi_decode_features",
    "d_exact_substr_clean",
    "s_snapshot_lifecycle",
    "s_snapshot_skipping",
    "st_snapshot_ivm",
    "s_odata_delta_sync",
    "d_semdedup_kmeans",
    "t_byte_entropy",
    "d_incremental_neardup",
    "g_triangle_count",
    # the 40 stalest round-6 rows (all but x_struct_functions)
    "c_merge_upsert",
    "e13_exact_distinct",
    "e13_percentiles",
    "e14_sessionize_batch",
    "e1_conditional_agg",
    "e1_pivot",
    "e1_salted_agg",
    "e1_unpivot",
    "e2_cube",
    "e2_grouping_sets",
    "e3_join_bucketed_colocated",
    "e3_join_cross",
    "e3_join_full_outer",
    "e3_join_right",
    "e5_window_distribution",
    "e5_window_lag_lead",
    "e5_window_ntile_nth",
    "e5_window_running_sum",
    "e7_except",
    "m_embed_quantize",
    "m_jpeg_decode_features",
    "q_sql_exists_subquery",
    "s_gzip_jsonl_roundtrip",
    "s_jsonl_roundtrip",
    "s_knn_lsh",
    "s_partitioned_scan_prune",
    "s_warc_ingest",
    "st_stateful_user_agg",
    "st_stream_dedup",
    "t_bpe_apply",
    "t_bpe_tokens",
    "t_bpe_train",
    "t_chunk_documents",
    "t_hash_split",
    "t_stratified_sample",
    "x_array_functions",
    "x_bitwise_functions",
    "x_math_functions",
    "x_null_conditional",
    "x_regex_hash_functions",
]

registry.promote(GATED_QUERIES)
