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

# The driver's correctness gate audits the FIRST 50 registrations, so we
# curate that window each round. Cumulative driver history (rounds 1-4)
# confirmed 92 of the first 169 registered queries (the registry has
# since grown to 174); every query NOT in this round's window keeps
# its local safety net via tests/test_oracle_parity (all 174 specs,
# every session).
#
# ROTATION (round 5, per VERDICT r04 item 1): the round-4 gate went
# 50/50 green and every family in it has at least one driver-confirmed
# row, so this round the window is rotated WHOLESALE to 50 queries that
# have never had a driver CORRECTNESS row — zero repeats from r04.
# Composition:
#   - the 14 TPC-H shapes with no driver row
#     (Q2/3/4/7/8/9/10/11/12/15/16/17/18/20);
#   - the two error-only-history queries (e12_from_json,
#     e12_variant_extract — r01 fixture bug, fixed since r02, locally
#     green ever since, never re-gated);
#   - all 15 round-4 late additions registered after the last
#     intra-round rotation (pretrain capstone, prefix-filter Jaccard,
#     CMS heavy hitters, OHLC, inactivity gaps, unigram LM, weighted
#     sampling, left-outer stream-stream join, incremental agg, SCD2
#     stream enrich, z-order, bitmap presence, URL sweep, compaction,
#     schema evolution);
#   - 7 never-gated rN holdovers (histogram, corr/regression, HOFs,
#     try_*, ORC, XML, range-sorted layout — ntile/nth was displaced
#     by the WAV addition below; its e5 family already has two driver
#     rows);
#   - 10 family-coverage picks whose verdict-table rows were
#     local-only: s_knn_ivf + s_knn_pq (approximate ANN tiers with
#     recall contracts), d_embedding_neardup (dedup-ladder tier),
#     t_repetition_metrics (E16), m_frame_sample
#     (E11 frame sampling), e4_scd2_intervals (E4 SCD2),
#     e5_window_range_frame (E5 range frames), st_sliding_window
#     (E14 sliding), e3_join_salted_skew (E3 skew path),
#     e14_gapfill_resample (sessionization family);
#   - m_png_decode_features + m_wav_decode_features, added THIS round
#     (pure-numpy+zlib PNG decode and RIFF/PCM WAV decode — the E11
#     codec ladder's compressed-image and audio gaps closed), gated
#     immediately so round-5 additions don't repeat r03's
#     added-after-rotation gap.
# Still unaudited after this rotation (next round's pool, 32 — incl.
# s_gzip_jsonl_roundtrip, s_warc_ingest and t_bpe_train, registered after this
# rotation; their format family already holds six window slots this
# round, so they wait). Round 6 should also REGISTER
# m_jpeg_decode_features — fully STAGED in plans/roundsix.py (query +
# closed-form oracle, green vs DuckDB at sf0.001 and sf0.01;
# activation checklist in that module's docstring; deferred only to
# respect the r04 inventory freeze at 174) — and put it straight into
# that window:
# d_simhash_neardup (its family keeps two driver rows this round),
# e5_window_ntile_nth (family has two driver rows),
# d_rollhash_fingerprint, t_bpe_tokens, d_simhash, s_knn_lsh,
# t_hash_split, t_stratified_sample, d_levenshtein_blocked,
# t_corpus_pipeline, st_stateful_user_agg, st_stream_dedup,
# e14_sessionize_batch, s_partitioned_scan_prune,
# e3_join_bucketed_colocated, e1_salted_agg, a_dedup_keep_latest,
# c_merge_upsert, x_math_functions, x_array_functions,
# s_jsonl_roundtrip, t_chunk_documents, m_embed_quantize,
# q_sql_exists_subquery, x_regex_hash_functions, x_struct_functions,
# e3_join_cross, x_null_conditional, x_bitwise_functions.
GATED_QUERIES = [
    # TPC-H shapes, never driver-audited
    "e6_q2_min_cost_supplier",
    "e6_q3_shipping_priority",
    "e6_q4_order_priority",
    "e6_q7_volume_shipping",
    "e6_q8_market_share",
    "e6_q9_product_profit",
    "e6_q10_returned_items",
    "e6_q11_important_stock",
    "e6_q12_priority_by_returnflag",
    "e6_q15_top_supplier",
    "e6_q16_part_supplier_counts",
    "e6_q17_small_qty_revenue",
    "e6_q18_large_volume_customer",
    "e6_q20_promotion_suppliers",
    # error-only driver history — re-gate
    "e12_from_json",
    "e12_variant_extract",
    # round-4 late additions
    "t_pretrain_pipeline",
    "d_prefix_filter_jaccard",
    "e13_cms_heavy_hitters",
    "e14_ohlc_bars",
    "e14_inactivity_gaps",
    "t_unigram_logprob",
    "t_weighted_sample_es",
    "st_stream_stream_left_join",
    "st_incremental_agg",
    "st_stream_scd2_enrich",
    "s_zorder_layout",
    "e13_bitmap_presence",
    "x_url_functions",
    "s_compaction_roundtrip",
    "s_schema_evolution_merge",
    # never-gated holdovers
    "e13_histogram",
    "e13_corr_regression",
    "x_hof_functions",
    "x_try_functions",
    "s_orc_roundtrip",
    "s_xml_roundtrip",
    "s_range_sorted_layout",
    # family-coverage picks (verdict table rows that were local-only)
    "s_knn_ivf",
    "s_knn_pq",
    "d_embedding_neardup",
    "m_png_decode_features",
    "m_wav_decode_features",
    "t_repetition_metrics",
    "m_frame_sample",
    "e4_scd2_intervals",
    "e5_window_range_frame",
    "st_sliding_window",
    "e3_join_salted_skew",
    "e14_gapfill_resample",
]

registry.promote(GATED_QUERIES)
