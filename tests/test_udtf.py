"""Python UDTF extension surface (SURVEY §2.2 UDF/UDAF/UDTF row):
a row-expanding table function must agree with the equivalent native
explode plan. UDTFs are row-at-a-time Python — the slow path — so the
engine treats them as a tested extension point; hot paths use native
exprs or Arrow UDFs instead."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.queries.base import t


@udtf(returnType="doc_id: bigint, pos: int, token: string")
class TokenizeUDTF:
    """Whitespace tokenizer as a table function: one (doc, position,
    token) row per token, same contract as posexplode(tokenize_ws)."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for pos, tok in enumerate(t for t in text.lower().split() if t):
            yield doc_id, pos, tok


def test_udtf_matches_native_explode(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    got = spark.sql(
        "SELECT u.doc_id, u.pos, u.token FROM udtf_docs d, "
        "LATERAL tokenize_udtf(d.doc_id, d.text) u"
    )
    want = docs.select(
        "doc_id",
        F.posexplode(tokenize_ws(F.lower(F.col("text")))).alias("pos", "token"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    assert len(w) > 0
