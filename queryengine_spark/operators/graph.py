"""Link-analysis over the near-dup candidate graph: fixed-iteration
PageRank in exact integer arithmetic — ranks documents by how
centrally they sit in the duplicate/similarity graph (a useful
curation signal: high-rank nodes are template/boilerplate hubs).

Spark shape: pure DataFrame power iteration — per round one
groupBy-sum of neighbor contributions and one left join back to the
vertex set; the frontier is localCheckpoint-ed to cut lineage
(iterative plans otherwise re-derive every prior round). Ranks and
contributions are BIGINT micro-units with explicit integer division
(``div``), so every round is exact and engine-portable — the DuckDB
oracle unrolls the same recurrence as chained CTEs and matches
bit-for-bit.

Recurrence (damping d = 0.85 = 17/20, base 1e6 per vertex):
  R0(v)   = 1_000_000
  S_t(v)  = sum over in-neighbors u of div(R_t(u), outdeg(u))
  R_t+1(v)= 150_000 + div(17 * S_t(v), 20)
Dangling mass is dropped (symmetric near-dup graphs have no dangling
nodes with edges; isolated vertices settle at 150_000), matching the
"weakly preferential" PageRank formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_BASE = 1_000_000
PR_TELEPORT = 150_000  # floor(0.15 * PR_BASE)


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iterations: int = 5,
) -> DataFrame:
    """Fixed-``iterations`` integer PageRank over the UNDIRECTED
    graph induced by ``edges`` (each pair contributes both
    directions). Returns (id, rank) for every vertex."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    # (src, dst, deg): the contribution topology, constant per round
    topo = sym.join(outdeg, "src").localCheckpoint(eager=False)

    ranks = vertices.select(
        F.col(id_col).alias("id"), F.lit(PR_BASE).cast("bigint").alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            topo.join(ranks, topo.src == ranks.id)
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.join(contrib, ranks.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit(PR_TELEPORT).cast("bigint")
                    + F.expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
