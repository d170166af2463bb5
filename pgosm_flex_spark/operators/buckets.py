"""Bounded LSH bucket pair generation — the monster-bucket skew guard.

Every banded-LSH tier (text/dedup.py:minhash_lsh_pairs, SimHash quarters,
images/neardup.py:phash_near_dup_pairs) generates candidates by self-joining
rows on a bucket key. The self-join is quadratic IN THE BUCKET: a web corpus
at 10^12 rows routinely holds a boilerplate page or a placeholder image
duplicated 10^8 times, and every copy lands in the same bucket in every band
(identical content ⇒ identical signature), so the within-bucket join alone
would emit ~10^16 candidate rows — unrepresentable, and no salting fixes it
(the PAIR COUNT is the problem, not key placement).

``bucket_pairs`` bounds it with star expansion: buckets at or under
``star_threshold`` produce their full within-bucket pair set exactly as the
plain self-join would; larger buckets instead pair every member with the
bucket's MINIMUM id only — O(n) rows instead of O(n²). For the case that
creates monster buckets (equal signatures from equal content) the downstream
result is unchanged: every star pair survives exact verification, and the
transitive closure (operators/components.py:connected_components — how the
dedup ladder consumes pairs) reconnects the full duplicate cluster through
the representative. The trade, documented and bounded to above-threshold
buckets only, is pair-RELATION completeness: a pair (b, c) whose only shared
bucket is oversized is reported only if both verify against the
representative. Pass ``star_threshold=None`` for the exact unbounded join.

One extra map-side-combinable aggregation per band (bucket size + min id)
buys a hard per-bucket bound — the same replicate-don't-enumerate bargain as
pip_join's salted fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_pairs(
    banded: DataFrame,
    id_col: str,
    key_cols: list[str],
    star_threshold: int | None = 1024,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Unordered candidate pairs ``(id_a, id_b)`` (id_a < id_b) of rows
    sharing a bucket key, with oversized buckets star-expanded.

    ``banded`` holds one row per (member, bucket); ``key_cols`` name the
    bucket key columns. ``payload_cols`` ride along as ``<col>_a``/
    ``<col>_b`` (each must be functionally determined by the id — e.g. the
    member's own hash — or the distinct inflates). Output is distinct
    across buckets (a pair sharing several buckets appears once).
    """
    pay = payload_cols or []

    def side(suffix: str) -> DataFrame:
        return banded.select(
            F.col(id_col).alias(f"id_{suffix}"),
            *[F.col(c).alias(f"{c}_{suffix}") for c in pay],
            *key_cols,
        )

    out_cols = ["id_a", "id_b"] + [f"{c}_{s}" for c in pay for s in ("a", "b")]
    if star_threshold is None:
        return (
            side("a")
            .join(side("b"), key_cols)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(*out_cols)
            .distinct()
        )
    # the guard's marginal cost over the exact join is ONE map-side-
    # combinable aggregation (bucket size + min id) broadcast onto the
    # RIGHT self-join side: a right row survives iff its bucket is small
    # (full pairing) or it IS the bucket's min-id representative (star
    # expansion), so oversized buckets contribute O(n) join matches instead
    # of O(n²) while the plan keeps the exact join's shape — same two side
    # scans, same single pair join, same distinct. Earlier formulations
    # (separate anti-join + star branch + rep-payload broadcast) each
    # measured 2-4× end-to-end at sf0.1: every extra exchange is a
    # serialized AQE job, `min_by`/`min(struct)` stats degrade to
    # SortAggregate (a full Sort of banded per broadcast build), and
    # column pruning gave each broadcast consumer a distinct agg projection
    # so ReuseExchange never fired. Folding the guard into the right side's
    # map chain removes all of that; the rep's payload rides its own row.
    stats = F.broadcast(
        banded.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(id_col).alias("__rep"),
        )
        .filter(F.col("__n") > star_threshold)
    )
    right = (
        banded.join(stats, key_cols, "left")
        .filter(F.col("__n").isNull() | (F.col(id_col) == F.col("__rep")))
        .select(
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"{c}_b") for c in pay],
            F.col("__n").alias("__n_b"),
            *key_cols,
        )
    )
    # small buckets pair once via id_a < id_b (right holds every member);
    # oversized buckets pair each member with the rep (right holds only the
    # rep, the bucket's MIN id, so id_a > id_b there — least/greatest
    # restores the id_a < id_b output convention).
    emit = F.when(F.col("__n_b").isNull(), F.col("id_a") < F.col("id_b")).otherwise(
        F.col("id_a") != F.col("id_b")
    )
    a_first = F.col("id_a") < F.col("id_b")
    return (
        side("a")
        .join(right, key_cols)
        .filter(emit)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            *[
                expr.alias(name)
                for c in pay
                for name, expr in (
                    (f"{c}_a", F.when(a_first, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b"))),
                    (f"{c}_b", F.when(a_first, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a"))),
                )
            ],
        )
        .distinct()
    )
