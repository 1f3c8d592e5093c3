"""Empty-input sweep: every registered query must survive zero rows.

C3 proved ONE query is schema-stable on empty input; this sweep proves
the other ~180 (VERDICT r06 item 4). Each registered query — batch and
availableNow-drained streaming alike — runs against a fixture dir of
ZERO-ROW parquet tables carrying the real schemas, and must build,
execute, and collect without raising. Catches the classic
first()/max()-on-empty, seed-collect-on-empty, and
infer-schema-on-empty-write crashes (round 7 found and fixed nine:
st_snapshot_merge, p_profile_table, p_expectations, s_knn_bruteforce/
ivf/pq, st_incremental_agg, s_partitioned_scan_prune,
s_compaction_roundtrip).

Row counts are NOT asserted to be zero: global aggregates legitimately
produce a row (count=0), profilers a row per column, recall summaries
a zeros row. The invariant is no-crash + a non-empty column set.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from turnover_odata_etl_spark.plans import registry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory, sf_dir):
    """Zero-row copies of every fixture table, real schemas preserved
    (pyarrow empty_table keeps the exact arrow schema, including the
    events ts encoding of the source fixture)."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.ParquetFile(
            os.path.join(sf_dir, f"{t}.parquet")
        ).schema_arrow
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(registry.all_specs()))
def test_query_survives_empty_input(spark, empty_dir, name):
    spec = registry.all_specs()[name]
    df = spec.fn(spark, empty_dir)
    assert df.columns, f"{name}: no columns on empty input"
    df.collect()  # must execute, not just plan


# Round-13 queries registered in round 14 (r13 cap ruling), round-14
# queries in round 15 (r14 cap ruling), and round-15 queries in round
# 16 (r15 cap ruling) — the registry sweep above covers them all; the
# dedicated staged blocks were removed per the activation checklists.

# Round-16 STAGED queries (plans/roundsixteen.py — held for a cap
# ruling) get the same treatment below until registration folds them
# into the sweep.
from turnover_odata_etl_spark.plans.roundsixteen import STAGED as STAGED_R16


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_query_survives_empty_input(spark, empty_dir, name):
    spec = STAGED_R16[name]
    df = spec.fn(spark, empty_dir)
    assert df.columns, f"{name}: no columns on empty input"
    df.collect()
