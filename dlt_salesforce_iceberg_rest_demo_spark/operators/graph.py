"""Graph operators over edge lists derived from the relational model.

The reference loads FK relationships as plain columns
(`/root/reference/data/salesforce_medium_scale.recipe.yml:78-79` —
Contact.AccountId etc.) and leaves graph analytics to consumers; here
the FK graph becomes a first-class edge list and the iterative
algorithms run as DataFrame loops (joins + aggregates per round), the
same message/update shape as `dedup.connected_components`.

Determinism: PageRank is computed in INTEGER micro-units with integer
division (``rank DIV degree``), so partial-aggregation order cannot
perturb results and a SQL oracle can reproduce the exact numbers by
unrolling the iterations — float PageRank sums would differ in the
last ulp between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    unit: int = 1_000_000,
) -> DataFrame:
    """PageRank (damping 0.85) over the symmetrized edge list, in
    integer micro-units.

    Per round: one join of ranks onto edges (contribution =
    ``rank DIV degree``) and one groupBy on the destination — the
    standard message-passing shuffle pair. State per round is (node,
    rank) longs only; with the graph symmetrized every node has both
    in- and out-edges, so no dangling-mass handling is needed and the
    output covers every node. ``iterations`` is fixed (not
    convergence-tested) so a SQL oracle can unroll the exact same
    rounds.

    Update rule (all BIGINT ops, both engines identical):
    ``rank' = 0.15*unit + (85 * SUM(rank_u DIV deg_u)) DIV 100``.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # Materialize the (usually join-derived) edge list ONCE: without
    # this every iteration's lazy plan re-runs the upstream joins -
    # 3 iterations re-scanned orders x lineitem 3x before the fix.
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d")).localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(unit).cast("long").alias("rank")
    )
    base = (unit * 15) // 100
    for _ in range(iterations):
        contrib = ranks.join(deg.withColumnRenamed("u", "node"), "node").select(
            "node", F.expr("rank DIV d").alias("c")
        )
        msgs = sym.join(contrib.withColumnRenamed("node", "u"), "u").select(
            F.col("v").alias("node"), "c"
        )
        ranks = msgs.groupBy("node").agg(
            (F.lit(base) + F.expr("(85 * sum(c)) DIV 100")).cast("long").alias("rank")
        )
    return ranks
