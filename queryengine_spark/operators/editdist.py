"""Edit-distance similarity join via deletion-neighborhood blocking
(the SymSpell scheme, Garbe 2012): two strings within Levenshtein
distance 1 necessarily share an element of {s} ∪ deletions1(s) —
equal strings share s itself; a substitution at position i makes both
i-th deletions equal; an insertion's deletion recovers the shorter
string. So the candidate set from an EQUI-join on deletion variants
is COMPLETE for d=1, and exact ``levenshtein() <= d`` is only the
residual verify — never the pair generator.

Spark shape (100 TB story): variant generation is a JVM-side
``transform(sequence(...))`` expression (no UDF, no shuffle); the
join is a plain equi-join on the variant string — bucketable,
AQE-splittable, never a cross join; `levenshtein` runs once per
distinct candidate pair. Per-string fan-out is len+1 variants, so
the exploded size is O(total characters) — linear in corpus bytes.

d >= 2 generalizes by deleting up to d characters (neighborhood size
C(len, d)); the quadratic-and-worse fan-out is the documented
SymSpell trade — this module implements the d=1 join and raises
otherwise rather than silently generating a combinatorial plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _variants_of(col_name: str) -> Column:
    """{s} ∪ all single-character deletions of s — JVM expression,
    no UDF."""
    return F.array_union(
        F.array(F.col(col_name)),
        F.expr(
            f"transform(sequence(1, length({col_name})), i -> "
            f"concat(substring({col_name}, 1, i - 1), "
            f"substring({col_name}, i + 1, length({col_name}))))"
        ),
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_term: str,
    right_id: str,
    right_term: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(term_l, term_r) <=
    ``max_dist`` via deletion-neighborhood blocking. Returns
    (q_id, r_id, dist)."""
    if max_dist != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for max_dist=1; "
            "d>=2 needs the C(len,d) multi-deletion neighborhood — see the "
            "module docstring for the documented trade"
        )
    lv = left.select(
        F.col(left_id).alias("q_id"),
        F.col(left_term).alias("q_term"),
        F.explode(_variants_of(left_term)).alias("v"),
    ).distinct()
    rv = right.select(
        F.col(right_id).alias("r_id"),
        F.col(right_term).alias("r_term"),
        F.explode(_variants_of(right_term)).alias("v"),
    ).distinct()
    cand = lv.join(rv, "v").select("q_id", "q_term", "r_id", "r_term").distinct()
    return cand.select(
        "q_id",
        "r_id",
        F.levenshtein("q_term", "r_term").cast("int").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
