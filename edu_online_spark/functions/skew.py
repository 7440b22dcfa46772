"""Two-stage salted aggregation — explicit skew mitigation.

The reference sketched this by hand and left it commented out
(RegisterStreaming.scala:105-118: random prefix → reduceByKey → strip →
reduceByKey). Under Catalyst it's usually unnecessary — partial
aggregation already collapses per-task duplicates and AQE splits skewed
joins — but two cases still want explicit salt at 100 TB:

  * high-cardinality aggregation states (collect_set/collect_list)
    where one hot key's state exceeds a task's memory;
  * skewed shuffle keys feeding non-AQE-splittable operators.

`salted_agg` spreads each key over `salt` sub-keys, runs the cheap
first-stage aggregate, then merges — both stages get map-side combine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    first_stage: dict[str, Column],
    second_stage: Callable[[str], Column],
    salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Generic two-stage aggregation.

    first_stage: output_name → aggregate Column for stage 1 (per
    (keys, salt) group). second_stage: output_name → merge aggregate
    built from the stage-1 column of that name (e.g. sum of partial
    counts).

    The salt is derived from deterministic row CONTENT only —
    xxhash64 over `salt_cols` (default: every non-key column). A salt
    built from rand() or monotonically_increasing_id() is a
    nondeterministic shuffle key: on a stage retry after a fetch
    failure, recomputed map output can land rows in different sub-keys
    and duplicate/lose them — exactly the hazard this helper exists to
    avoid. The cost of determinism: rows identical in all salt_cols
    share a sub-key, so pass a unique id column as salt_cols when the
    hot key's rows are content-identical.

    A frame with ONLY the key columns has no content to salt from —
    every row of a hot key would hash to the same sub-key and the
    helper would silently do nothing — so that case raises instead of
    degrading; keep a unique id or payload column through the select,
    or pass salt_cols explicitly.
    """
    if salt_cols is None:
        salt_cols = [c for c in df.columns if c not in keys]
        if not salt_cols:
            raise ValueError(
                "salted_agg: no non-key columns to derive a deterministic "
                "salt from — a salt hashed from the key alone is constant "
                "per key (zero spreading). Keep a unique id or payload "
                "column through the select, or pass salt_cols explicitly."
            )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in first_stage.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[second_stage(n).alias(n) for n in first_stage]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigated inner equi-join: the big side gets a
    content-derived salt, the small side is replicated `salt`× (explode
    of a literal range), and the join key becomes (keys..., salt) — a
    hot key's rows now spread over `salt` reducers instead of one.

    Cost model: the small side's shuffle volume multiplies by `salt`
    (why this exists for dimension-sized, not fact-sized, build sides);
    the big side's volume is unchanged. Inner-join semantics are
    preserved exactly: each big-side row matches precisely the one
    replica carrying its salt value. Salt is deterministic row content
    (same rationale as salted_agg). AQE's skew-join splitting makes
    this unnecessary for sort-merge joins it can see; this helper is
    for the cases it can't (e.g. a skewed key feeding a downstream
    stateful op where you want the spread to persist).
    """
    if salt_cols is None:
        salt_cols = [c for c in big.columns if c not in on]
        if not salt_cols:
            raise ValueError(
                "salted_join: the big side has no non-join columns to derive "
                "a deterministic salt from — a salt hashed from the join key "
                "alone is constant per key, so the hot key still lands on "
                "one reducer while the small side is replicated salt× for "
                "nothing. Keep a payload column or pass salt_cols explicitly."
            )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(replicated, [*on, "_salt"]).drop("_salt")


def salted_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Salted count per key — the reference's exact example (A10)."""
    return salted_agg(
        df,
        keys,
        {"cnt": F.count("*")},
        lambda n: F.sum(n).cast("long"),
        salt,
    )
