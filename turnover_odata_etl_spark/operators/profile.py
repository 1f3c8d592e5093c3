"""Table profiling — one-pass per-column statistics.

The data-quality primer every pipeline runs before trusting an input:
row count, per-column null count/rate, distinct count, min/max, and
numeric mean — computed in ONE aggregation pass over the table (every
statistic is an algebraic/sketchable aggregate, so the scan happens
once and partial aggregation does the heavy lifting map-side; the
result is columns × stats, driver-tiny).

At 100 TB this shape matters: profiling must not be "run 4 queries per
column" (4·N scans) but one scan with N×4 aggregates. One honest cost
note: EXACT distinct counts over N columns make Spark plan an Expand
(each row replicated N+1 times with a grouping id) before the partial
aggregate — still one scan, but (N+1)× rows into the first aggregate.
``approx=True`` swaps in HLL++ sketches, which aggregate like any
other function (no Expand, pure map-side partials) — that is the
100 TB default; exact is for fixture-sized oracle checks.

Output is long-form (one row per column) rather than one wide row:
long-form unions across tables, joins against expectation rules, and
survives >100-column tables without a 400-column result schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(column, n_rows, n_null, null_frac, n_distinct, min_str,
    max_str, mean) — one row per profiled column, one scan total.

    min/max stringify (rounded at 4dp for fractional numerics first)
    so heterogeneous column types share one result schema; mean is
    NULL for non-numeric columns. ``approx=True`` swaps exact distinct
    counting for HLL++ (the 100 TB default)."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(schema[c], _NUMERIC)
        is_fractional = types[c] in ("float", "double") or types[c].startswith(
            "decimal"
        )
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        mn, mx = F.min(c), F.max(c)
        if is_fractional:
            # round→decimal before stringifying: raw double→string
            # formatting diverges across engines (Java flips to
            # scientific notation at 1e7; DuckDB never does), decimal
            # rendering is identical everywhere.
            mn = F.round(mn, 4).cast("decimal(38,4)")
            mx = F.round(mx, 4).cast("decimal(38,4)")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            distinct.alias(f"__dist_{c}"),
            mn.cast("string").alias(f"__min_{c}"),
            mx.cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.col(c)), 4)
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"__mean_{c}"),
        ]

    wide = df.agg(*aggs)
    # wide (1 row) → long (|cols| rows): a tiny driver-free unpivot via
    # an inline stack over the single aggregated row.
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.round(
                    # try_divide: an empty table profiles to NULL
                    # fractions instead of an ANSI divide-by-zero
                    F.try_divide(F.col(f"__null_{c}"), F.col("__n")), 4
                ).alias("null_frac"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
                F.col(f"__mean_{c}").alias("mean"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(structs).alias("s"))
        .select("s.*")
    )


def check_expectations(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Declarative data-quality gate: evaluate expectation rules in ONE
    aggregation pass and emit a violations report (rule, n_violations,
    violation_frac, passed).

    Each rule is a dict: ``{"name": str, "predicate": Column-or-SQL}``
    where the predicate expresses the EXPECTED condition per row
    (violations = rows where it is false or null). Because every rule
    compiles to ``count(CASE WHEN NOT p THEN 1 END)``, N rules cost
    one scan with N counting aggregates — the same single-pass shape
    as profile_table, and the scan prunes to exactly the columns the
    rules mention. The report is rule-sized (driver-tiny); gating a
    pipeline is `assert report.filter(~col("passed")).isEmpty()`.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in rules:
        pred = r["predicate"]
        cond = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(
                f"__viol_{r['name']}"
            )
        )
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(r["name"]).alias("rule"),
                F.col(f"__viol_{r['name']}").alias("n_violations"),
                F.round(
                    # try_divide: zero-row inputs gate to NULL fracs
                    F.try_divide(
                        F.col(f"__viol_{r['name']}"), F.col("__n")
                    ),
                    6,
                ).alias("violation_frac"),
                (F.col(f"__viol_{r['name']}") == 0).alias("passed"),
            )
            for r in rules
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")
