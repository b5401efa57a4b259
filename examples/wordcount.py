"""Example user script for the run-anywhere contract
(``python -m dask_ssh_docker_spark.runner examples/wordcount.py [sf_dir]``).

Defines ``main(argv)`` and uses the session the runner provides — the same
script runs on local[*] or a cluster with zero changes (the contract of
the reference's script runner; see SURVEY.md §2.A).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    spark = SparkSession.getActiveSession()
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .count()
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(10)
    )
    for row in top.collect():
        print(f"{row['word']}\t{row['count']}")
    return 0
