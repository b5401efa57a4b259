"""Runner CLI contract, streaming twins, multimodal decode plumbing."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_runner_executes_main_contract(tmp_path):
    script = tmp_path / "user_script.py"
    script.write_text(
        textwrap.dedent(
            """
            from pyspark.sql import SparkSession
            def main(argv):
                spark = SparkSession.getActiveSession()
                assert spark is not None, "runner must provide the session"
                total = spark.range(1000).selectExpr("sum(id) s").first().s
                print(f"RESULT {total} ARGS {','.join(argv)}")
                return 0
            """
        )
    )
    out = subprocess.run(
        [sys.executable, "-m", "dask_ssh_docker_spark.runner",
         "--conf", "spark.ui.enabled=false", str(script), "--", "a", "b"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # reference smoke invariant: sum(range(1000)) == 499500
    assert "RESULT 499500 ARGS a,b" in out.stdout


def test_runner_rejects_scripts_without_main(tmp_path):
    script = tmp_path / "no_main.py"
    script.write_text("x = 1\n")
    out = subprocess.run(
        [sys.executable, "-m", "dask_ssh_docker_spark.runner",
         "--conf", "spark.ui.enabled=false", str(script)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "main(argv)" in out.stderr


def test_streaming_tumbling_equals_batch(spark):
    from dask_ssh_docker_spark.queries import REGISTRY

    stream_out = (
        REGISTRY["stream_tumbling_counts"].fn(spark, SF).toPandas()
        .sort_values(["bucket_start", "event_type"]).reset_index(drop=True)
    )
    batch = (
        REGISTRY["resample_hourly"].fn(spark, SF).toPandas()
        .drop(columns=["avg_value"])
        .sort_values(["bucket_start", "event_type"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(stream_out[batch.columns], batch)


def test_streaming_dedup_within_watermark(spark):
    from dask_ssh_docker_spark.streaming import (
        dedup_within_watermark,
        run_to_completion,
        stream_events,
    )

    s = stream_events(spark, SF)
    deduped = run_to_completion(
        dedup_within_watermark(s, ["event_id"]), output_mode="append"
    )
    n = deduped.count()
    from dask_ssh_docker_spark.sources import load_table

    assert n == load_table(spark, SF, "events").select("event_id").distinct().count()


def test_decode_stub_deterministic_and_fake_labeled(spark):
    from dask_ssh_docker_spark.operators.multimodal import decode_image_meta

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "blob": [b"\x89PNG1234", b"\xff\xd8\xffdata"]})
    )
    a = decode_image_meta(df, "blob", "doc_id", fake=True).toPandas()
    b = decode_image_meta(df, "blob", "doc_id", fake=True).toPandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic fake
    assert set(a["decoder"]) == {"fake"}
    assert a["decode_ok"].all()
    assert ((a["width"] >= 64) & (a["width"] < 256)).all()


def test_decode_without_lib_raises(spark):
    from dask_ssh_docker_spark.operators.multimodal import decode_image_meta

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not reachable")
    except ImportError:
        pass
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [b"x"]}))
    with pytest.raises(Exception) as ei:
        decode_image_meta(df, "blob", "doc_id", fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "pillow" in str(ei.value)


def test_sniff_format_magic_bytes(spark):
    from dask_ssh_docker_spark.operators.multimodal import sniff_format

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "blob": [
                    b"\x89PNG\r\n\x1a\n...",
                    b"\xff\xd8\xff\xe0JFIF",
                    b"GIF89a...",
                    b"RIFF....WAVE",
                    b"plain text",
                ]
            }
        )
    )
    got = [r[0] for r in df.select(sniff_format("blob")).collect()]
    assert got == ["png", "jpeg", "gif", "riff", "unknown"]


def test_runner_hold_mode_blocks_until_stdin(tmp_path):
    """No script ⇒ hold: session info printed, blocks on stdin, clean exit
    (reference bin/dask-ssh-docker:71-74 contract)."""
    out = subprocess.run(
        [sys.executable, "-m", "dask_ssh_docker_spark.runner",
         "--master", "local[2]", "--conf", "spark.ui.enabled=false"],
        input="\n", capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "session up: master=local[2]" in out.stdout
    assert "tearing down session" in out.stdout


def test_runner_py_files_ships_dep_to_executors(tmp_path):
    """--py-files must work on a programmatically built session (addPyFile,
    not just the spark-submit-only conf)."""
    dep = tmp_path / "runner_dep_mod.py"
    dep.write_text("VALUE = 20260813\n")
    script = tmp_path / "uses_dep.py"
    script.write_text(
        textwrap.dedent(
            """
            from pyspark.sql import SparkSession
            def main(argv):
                spark = SparkSession.getActiveSession()
                def check(it):
                    import runner_dep_mod
                    yield runner_dep_mod.VALUE
                vals = spark.sparkContext.parallelize(range(4), 4).mapPartitions(check).collect()
                assert vals == [20260813] * 4, vals
                print("DEP_OK")
                return 0
            """
        )
    )
    out = subprocess.run(
        [sys.executable, "-m", "dask_ssh_docker_spark.runner",
         "--master", "local[4]", "--conf", "spark.ui.enabled=false",
         "--py-files", str(dep), str(script)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DEP_OK" in out.stdout


def test_write_jdbc_option_plumbing():
    """No DB in the container: assert the wrapper plumbs url/table/mode/
    batchsize/isolation/options into the DataFrameWriter and saves."""
    from dask_ssh_docker_spark.sources import write_jdbc

    class FakeWriter:
        def __init__(self):
            self.opts, self.fmt, self.saved = {}, None, False
            self.write_mode = None

        def format(self, f):
            self.fmt = f
            return self

        def mode(self, m):
            self.write_mode = m
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def save(self):
            self.saved = True

    class FakeDF:
        def __init__(self, w):
            self.write = w
            self.coalesced = None

        def coalesce(self, n):
            self.coalesced = n
            return self

    w = FakeWriter()
    df = FakeDF(w)
    write_jdbc(
        df, "jdbc:postgresql://h/db", "t_out", mode="overwrite",
        batch_size=5000, num_partitions=4, isolation_level="READ_COMMITTED",
        truncate="true",
    )
    assert w.saved and w.fmt == "jdbc" and w.write_mode == "overwrite"
    assert df.coalesced == 4
    assert w.opts == {
        "url": "jdbc:postgresql://h/db",
        "dbtable": "t_out",
        "batchsize": "5000",
        "isolationLevel": "READ_COMMITTED",
        "truncate": "true",
    }
