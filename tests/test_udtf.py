"""Python UDTF surface (SURVEY.md §2.J one-row→many-rows; Spark ≥3.5
``@udtf``).  The hot-path equivalent is explode-of-array
(``str_split_explode`` query); this pins the decorator path itself."""

from __future__ import annotations

import pytest


def test_udtf_ngrams(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("no @udtf in this PySpark")

    from pyspark.sql.types import Row

    @udtf(returnType="gram: string, pos: int")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield f"{toks[i]} {toks[i+1]}", i

    spark.udtf.register("bigrams", Bigrams)
    df = spark.createDataFrame([Row(s="a b c d")])
    df.createOrReplaceTempView("t_udtf")
    got = spark.sql(
        "SELECT g.gram, g.pos FROM t_udtf, LATERAL bigrams(s) AS g ORDER BY pos"
    ).collect()
    assert [(r.gram, r.pos) for r in got] == [("a b", 0), ("b c", 1), ("c d", 2)]
