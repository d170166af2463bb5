"""Distributed connected components over an edge list — the grouping stage
of the dedup ladder.

Every near-dup tier (``text/dedup.py``, ``images/neardup.py``,
``similarity/ann.py``) emits *pairs*; a curation pipeline needs *groups*:
"keep one document per duplicate cluster" requires the transitive closure of
the pair relation (A~B, B~C ⇒ {A,B,C} is one cluster even if the A~C pair
was never emitted). Spark has no built-in for this (GraphFrames is an
external package, absent here), so this module implements the alternating
large-star / small-star algorithm of Kiveris et al., "Connected Components
in MapReduce and Beyond" (ACM SoCC 2014) in pure DataFrame ops:

- **large-star**: every node links its strictly-larger neighbors to the
  minimum of its closed neighborhood. High-degree hubs are split in one
  round — this is the skew guard: a 10^8-member duplicate cluster (e.g. a
  boilerplate page) never funnels through one reducer key for more than the
  first round.
- **small-star**: every node links its smaller neighbors (and itself) to
  their minimum, collapsing chains toward the component minimum.

Alternating the two converges in O(log n) rounds to a star graph whose
centers are the component minima (Theorem 1 of the paper). Each round is
two node-keyed shuffles over the *current* edge set, which only shrinks
(both stars emit ≤ the edges they consume after the dedup), so cost is
O(E log n) total — the published bound, and the shape that survives a
10^12-row corpus where label-propagation's O(diameter) rounds would not.

Per-round lineage is truncated with an eager ``localCheckpoint`` (the same
iterative-loop pattern as ``operators/routing.py:shortest_paths``), and the
previous round's blocks are dropped so the loop pins one edge set, not one
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: (v, min(Γ⁺(u))) for every v ∈ Γ(u), v > u."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("m0"))
        .select("src", F.least("m0", "src").alias("m"))
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient each edge toward the larger endpoint,
    then link every smaller neighbor AND the node itself to the minimum."""
    o = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    with_min = o.join(mins, "src")
    self_links = with_min.select("src", F.col("m").alias("dst"))
    nbr_links = with_min.filter(F.col("dst") != F.col("m")).select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    return self_links.unionByName(nbr_links).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; ``component``
    is the minimum node id of its connected component.

    ``edges`` is treated as undirected; self-loops and duplicate edges are
    tolerated. Nodes with no edges don't appear (the caller left-joins and
    coalesces to self — see :func:`dedup_keep_map`).

    Node ids may be any integral type (normalized to long) or strings
    (compared lexicographically — ``component`` is then the lexicographic
    minimum; this is what the image tier's ``image_id`` pairs use). Mixed or
    other id types raise instead of silently dropping edges through a failed
    cast — an all-NULL cast here would otherwise report "zero duplicate
    clusters" on a corpus full of them.

    Convergence is detected with an order-independent edge-set checksum
    (count + bit_xor of xxhash64(src, dst)): the algorithm's state is a set,
    so an unchanged (count, checksum) pair after a large+small round means a
    fixed point (a collision needs two distinct edge sets of equal size with
    equal 64-bit hash XORs — ~2⁻⁶⁴, far below the float tolerance everywhere
    else in this engine). A non-converged loop RAISES rather than returning
    a partial clustering: max_rounds=64 allows 2⁶⁴ nodes at the paper's
    O(log n) bound, so hitting it means a logic error, not a big graph."""
    from pyspark.sql.types import IntegralType, StringType

    src_t = edges.schema[src].dataType
    dst_t = edges.schema[dst].dataType
    if isinstance(src_t, StringType) and isinstance(dst_t, StringType):
        s_expr, d_expr = F.col(src), F.col(dst)
    elif isinstance(src_t, IntegralType) and isinstance(dst_t, IntegralType):
        s_expr, d_expr = F.col(src).cast("long"), F.col(dst).cast("long")
    else:
        raise ValueError(
            f"connected_components needs both id columns integral or both "
            f"string; got {src}:{src_t.simpleString()}, "
            f"{dst}:{dst_t.simpleString()} — a lossy cast would silently "
            "drop edges"
        )
    cur = (
        edges.select(s_expr.alias("src"), d_expr.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _sig(df: DataFrame) -> tuple:
        # bit_xor: order-independent, no ANSI overflow, and each round's edge
        # set is distinct-by-construction so XOR-cancellation needs an exact
        # duplicate row, which cannot occur
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev_sig = _sig(cur)
    for _ in range(max_rounds):
        prev = cur
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _sig(cur)
        prev.unpersist(blocking=False)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "— edge set still changing; this exceeds the O(log n) bound and "
            "indicates a bug, not a large graph"
        )
    # fixed point is a star graph: src = member, dst = component minimum.
    # The minima themselves appear only on the dst side; add their self rows.
    # cur stays pinned: the returned frame reads its checkpointed blocks
    # (same contract as routing.shortest_paths' final frontier)
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
    return members.unionByName(roots).distinct()


def dedup_keep_map(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → canonical-keeper map: (doc_id, keep_id, n_in_group)
    for every document that appears in at least one pair; ``keep_id`` is the
    minimum doc id of its transitive duplicate cluster (the standard
    keep-first policy of web-corpus dedup). Docs in no pair are implicitly
    their own keepers — callers drop rows where doc_id != keep_id and keep
    everything unmapped."""
    comp = connected_components(pairs, src=a_col, dst=b_col)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_in_group"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("keep_id"),
        "n_in_group",
    )
