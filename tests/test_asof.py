"""as_of_join edge cases: exact-time tie (rt == t matches), no prior
right row (NULLs), interleaved keys, left rows preserved exactly."""

from __future__ import annotations

from queryengine_spark.operators.asof import as_of_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 8, "c"), (2, 5, "d"), (3, 7, "e")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 6, 50.0), (4, 1, 9.0)],
        ["k", "rt", "v"],
    )
    out = {
        (r["k"], r["t"]): (r["asof_rt"], r["asof_v"])
        for r in as_of_join(left, right, ["k"], "t", "rt", ["v"]).collect()
    }
    assert len(out) == 5  # every left row exactly once
    assert out[(1, 8)] == (8, 100.0)    # rt == t matches (<=)
    assert out[(1, 10)] == (8, 100.0)   # latest prior
    assert out[(1, 20)] == (15, 200.0)
    assert out[(2, 5)] == (None, None)  # right exists but only later
    assert out[(3, 7)] == (None, None)  # key absent on right


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame([(1, 9, 1.5, "x")], ["k", "rt", "v", "s"])
    row = as_of_join(left, right, ["k"], "t", "rt", ["v", "s"]).collect()[0]
    assert (row["asof_rt"], row["asof_v"], row["asof_s"]) == (9, 1.5, "x")

def test_asof_right_tiebreak_greatest_wins(spark):
    """Duplicate right rows on the same (key, time): the greatest
    right_tiebreak value must win deterministically."""
    left = spark.createDataFrame([(1, 10), (1, 5)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 5, 1, 10.0), (1, 5, 3, 30.0), (1, 5, 2, 20.0)],
        ["k", "rt", "seq", "v"],
    )
    out = {
        r["t"]: r["asof_v"]
        for r in as_of_join(
            left, right, ["k"], "t", "rt", ["v"], right_tiebreak="seq"
        ).collect()
    }
    assert out[5] == 30.0
    assert out[10] == 30.0


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (backward,
    exact matches allowed) — the independent reference semantics."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        nl, nr, nk = 200, 120, 5
        lpdf = pd.DataFrame(
            {
                "k": rng.integers(0, nk, nl),
                "t": rng.integers(0, 50, nl),
                "lid": np.arange(nl),
            }
        )
        rpdf = pd.DataFrame(
            {
                "k": rng.integers(0, nk, nr),
                "rt": rng.integers(0, 50, nr),
                "seq": np.arange(nr),
                "v": rng.integers(0, 1000, nr).astype("float64"),
            }
        )
        got = (
            as_of_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                ["k"],
                "t",
                "rt",
                ["v"],
                right_tiebreak="seq",
            )
            .toPandas()
            .set_index("lid")
            .sort_index()
        )
        # pandas reference: sort right by (rt, seq) so the last row at
        # an equal timestamp is the greatest-seq one (merge_asof takes
        # the last), matching right_tiebreak="seq"
        want = pd.merge_asof(
            lpdf.sort_values("t", kind="stable"),
            rpdf.sort_values(["rt", "seq"], kind="stable"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        ).set_index("lid").sort_index()
        lhs = {k: (None if pd.isna(v) else v) for k, v in got["asof_v"].items()}
        rhs = {k: (None if pd.isna(v) else v) for k, v in want["v"].items()}
        assert lhs == rhs, f"seed {seed}"
