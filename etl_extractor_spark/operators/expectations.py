"""Data-quality expectations — declarative validation rules compiled
to one aggregation pass.

The reference validates nothing (it deliberately coerces everything,
SURVEY §4.2.2/§2.3 "no row-level filters"); a production warehouse
needs the opposite: assertable contracts on every staged table. Rules
compile to conditional-count expressions evaluated in a SINGLE scan +
single (tiny) aggregation — at 100 TB you cannot afford one pass per
rule, and you never collect violating rows to the driver, just counts
(violation sampling is a separate bounded query).

Rule types: not_null, unique, range (inclusive), accepted_values,
regex. ``unique`` is the only rule needing a shuffle (distinct count);
it rides the same job, not a separate scan per rule.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict[str, Any]) -> Column:
    """Count of rows violating the rule (0 = clean)."""
    t, c = rule["type"], rule.get("col")
    col = F.col(c) if c else None
    if t == "not_null":
        return F.count_if(col.isNull())
    if t == "range":
        lo, hi = rule["min"], rule["max"]
        return F.count_if(col.isNull() | (col < lo) | (col > hi))
    if t == "accepted_values":
        return F.count_if(~col.isin(rule["values"]) | col.isNull())
    if t == "regex":
        return F.count_if(~col.rlike(rule["pattern"]) | col.isNull())
    if t == "unique":
        # rows beyond the first per value = duplicates
        return (F.count(col) - F.countDistinct(col)).cast("long")
    raise ValueError(f"unknown rule type: {t}")


def validate_report(df: DataFrame, rules: list[dict[str, Any]]) -> DataFrame:
    """One row per rule: (rule, violations). All rules evaluate in one
    aggregation over one scan."""
    aggs = [
        _violation_expr(r).alias(r.get("name", f"{r['type']}_{r.get('col', '')}"))
        for r in rules
    ]
    wide = df.agg(*aggs)
    names = [f.name for f in wide.schema.fields]
    # unpivot to (rule, violations) — map-side Expand, no extra shuffle
    return wide.unpivot([], names, "rule", "violations")


def is_valid(df: DataFrame, rules: list[dict[str, Any]]) -> bool:
    """Gate form: True iff every rule has zero violations."""
    row = validate_report(df, rules).agg(F.max("violations")).first()
    return (row[0] or 0) == 0


def _row_violates(rule: dict[str, Any]) -> Column:
    """Row-local violation predicate (everything except ``unique``,
    which needs group context and lives in the aggregate report)."""
    t, c = rule["type"], rule.get("col")
    col = F.col(c)
    if t == "not_null":
        return col.isNull()
    if t == "range":
        return col.isNull() | (col < rule["min"]) | (col > rule["max"])
    if t == "accepted_values":
        return ~col.isin(rule["values"]) | col.isNull()
    if t == "regex":
        return ~col.rlike(rule["pattern"]) | col.isNull()
    raise ValueError(f"rule type {t} has no row-local predicate")


def violation_samples(
    df: DataFrame,
    rules: list[dict[str, Any]],
    key_col: str,
    k: int = 5,
    hash_c: int = 2654435761,
) -> DataFrame:
    """Up to ``k`` violating rows per rule, chosen by a deterministic
    key hash — the debugging companion to validate_report. One scan
    tags each row with every rule it violates (array + explode, no
    per-rule passes), one window caps the sample per rule; output is
    bounded at k × rules regardless of how broken the table is.
    """
    tags = F.array(
        *[
            F.when(_row_violates(r), F.lit(r["name"]))
            for r in rules
        ]
    )
    order = F.pmod(F.col(key_col) * F.lit(hash_c), F.lit(1_000_000_007))
    from pyspark.sql import Window

    w = Window.partitionBy("rule").orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("rule", F.explode(F.array_compact(tags)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
