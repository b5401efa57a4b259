"""The bench's Spark-side floor is round-over-round instrumentation
(VERDICT r8 item 1): its probe names and measurement mode must stay
fixed or cross-round comparisons silently break.  This smoke test pins
the contract — it does NOT assert timings (the whole point of the floor
is that walls vary)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_spark_floor_contract(spark):
    from bench import FLOOR, spark_floor

    probes = spark_floor(spark)
    # fixed probe set + a total; all positive floats
    assert set(probes) == {"codegen", "shuffle", "arrow", "total"}
    assert all(isinstance(v, float) and v > 0 for v in probes.values())
    assert abs(
        probes["total"] - (probes["codegen"] + probes["shuffle"] + probes["arrow"])
    ) < 0.01
    # the DuckDB floor's fixed query names are part of the same contract
    assert FLOOR == ["q1_pricing_summary", "q5_region_revenue", "text_quality"]
