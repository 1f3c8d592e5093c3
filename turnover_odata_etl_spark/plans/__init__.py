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
# ROTATION (round 9 — pure freshness; REGISTRY STAYS FROZEN AT 191):
# the r07 cap ruling ("register all nine; the cap moves to 191 and
# freezes there") was executed in round 8 and NO round-8 verdict
# exists to grant a new ruling, so the six oracle-green
# plans/roundnine.py queries remain STAGED (locally tested +
# bench-timed in the staged_r9 section) and this window is rotation
# only:
#   - ALL 41 remaining round-5 rows (scripts/staleness.py output;
#     after a green r09 gate the driver freshness floor moves from
#     round 5 to round 6);
#   - 9 round-6 rows. All round-6 rows are equally old in the ledger,
#     so "stalest" is broken by code drift since round 6, as the
#     r07/r08 rotations did: d_rollhash_fingerprint /
#     t_corpus_pipeline / s_warc_to_pretrain are EDITED this round
#     (null-safe keep-one joins, ADVICE r08 medium), the d_* dedup
#     family rows ride the same plans/llm.py + operators/dedup.py
#     drift, and the a_dedup pair are the alphabetical-first fillers.
# Next-stalest after this round: the remaining 41 round-6 rows
# (listed by scripts/staleness.py). Round-10 window math, assuming
# the TEN staged plans/roundnine.py queries (six from round 8 +
# d_semdedup_kmeans, t_byte_entropy, d_incremental_neardup and
# g_triangle_count added round 9) get a cap ruling then:
# 10 new + the 40 stalest round-6 rows = 50.
#
GATED_QUERIES = [
    # all 41 remaining round-5 rows (freshness floor -> round 6)
    "e13_corr_regression",
    "e13_histogram",
    "e14_gapfill_resample",
    "e14_inactivity_gaps",
    "e14_ohlc_bars",
    "e3_join_salted_skew",
    "e4_scd2_intervals",
    "e5_window_range_frame",
    "e6_q10_returned_items",
    "e6_q11_important_stock",
    "e6_q12_priority_by_returnflag",
    "e6_q15_top_supplier",
    "e6_q16_part_supplier_counts",
    "e6_q17_small_qty_revenue",
    "e6_q18_large_volume_customer",
    "e6_q20_promotion_suppliers",
    "e6_q2_min_cost_supplier",
    "e6_q3_shipping_priority",
    "e6_q4_order_priority",
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
    "s_xml_roundtrip",
    "s_zorder_layout",
    "st_sliding_window",
    "st_stream_scd2_enrich",
    "st_stream_stream_left_join",
    "t_pretrain_pipeline",
    "t_repetition_metrics",
    "t_unigram_logprob",
    "t_weighted_sample_es",
    "x_hof_functions",
    "x_try_functions",
    "x_url_functions",
    # 9 round-6 rows with the most code drift since their row
    "d_rollhash_fingerprint",
    "t_corpus_pipeline",
    "s_warc_to_pretrain",
    "d_simhash",
    "d_simhash_neardup",
    "d_levenshtein_blocked",
    "d_phash_neardup",
    "a_dedup_keep_latest",
    "a_dedup_rows",
]

registry.promote(GATED_QUERIES)
