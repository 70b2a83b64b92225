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

d = 2 (r5): the neighborhood grows to {s} ∪ deletions1 ∪ deletions2
(1 + L + C(L,2) variants — the documented quadratic SymSpell
fan-out, still a pure JVM expression and still an equi-join).
Completeness for d=2 follows the same argument as d=1 applied twice:
any ≤2-edit alignment can be normalized into ≤2 deletions on each
side landing on a common string (pinned against brute-force
levenshtein over random vocabularies in tests/test_addenda.py).
d >= 3's factorial fan-out remains the documented cut-off — the
module raises rather than silently generating a combinatorial plan.
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


def _variants_upto2(col_name: str) -> Column:
    """{s} ∪ deletions1 ∪ deletions2 — all strings reachable by
    deleting ≤ 2 characters, as one JVM expression. The two-deletion
    set enumerates position pairs i < j (delete both, keeping the
    middle i+1..j-1 slice); the CASE guards length < 2, where Spark's
    ``sequence(1, 0)`` would otherwise DESCEND instead of being
    empty."""
    pairs = F.expr(
        f"CASE WHEN length({col_name}) < 2 THEN array() "
        f"ELSE flatten(transform(sequence(1, length({col_name}) - 1), i -> "
        f"transform(sequence(i + 1, length({col_name})), j -> "
        f"concat(substring({col_name}, 1, i - 1), "
        f"substring({col_name}, i + 1, j - i - 1), "
        f"substring({col_name}, j + 1, length({col_name})))))) END"
    )
    return F.array_distinct(F.concat(_variants_of(col_name), pairs))


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
    ``max_dist`` (1 or 2) via deletion-neighborhood blocking.
    Returns (q_id, r_id, dist)."""
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for max_dist in "
            "(1, 2); d>=3's C(len,d) fan-out is the documented cut-off — "
            "see the module docstring"
        )
    variants = _variants_of if max_dist == 1 else _variants_upto2
    # r12 shuffle-bytes fix: the exploded variant relations carry ONLY
    # (id, variant) — the term strings no longer ride through the
    # explode, the two distincts and the variant equi-join (guide
    # "shuffle keys, not payloads": at L-char terms the d=2 fan-out is
    # O(L²) rows, each previously dragging the full term along). Terms
    # re-attach to the distinct candidate PAIRS by id — id→term is
    # functional per row, and the same exact levenshtein ≤ d verify
    # runs after the re-attach, so the result set is unchanged.
    lv = left.select(
        F.col(left_id).alias("q_id"),
        F.explode(variants(left_term)).alias("v"),
    ).distinct()
    rv = right.select(
        F.col(right_id).alias("r_id"),
        F.explode(variants(right_term)).alias("v"),
    ).distinct()
    cand = lv.join(rv, "v").select("q_id", "r_id").distinct()
    # distinct mirrors the old shape's (id, term)-level dedup so exact
    # duplicate input rows cannot double pairs through the re-attach
    lt = left.select(
        F.col(left_id).alias("q_id"), F.col(left_term).alias("q_term")
    ).distinct()
    rt = right.select(
        F.col(right_id).alias("r_id"), F.col(right_term).alias("r_term")
    ).distinct()
    return (
        cand.join(lt, "q_id")
        .join(rt, "r_id")
        .select(
            "q_id",
            "r_id",
            F.levenshtein("q_term", "r_term").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
