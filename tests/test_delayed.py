"""delayed layer + hostfile bootstrap: the reference's demonstrated
workloads must run byte-identical through the new API, on Spark workers."""

from __future__ import annotations

import os

import pytest

from dask_ssh_docker_spark.delayed import Delayed, compute, delayed
from dask_ssh_docker_spark.session import master_from_hosts, parse_hosts


def test_reference_smoke_sum(spark):
    # /root/reference/example/test.py:23 — print(dask.delayed(sum)(range(1000)).compute())
    assert delayed(sum)(range(1000)).compute(spark) == 499500


def test_reference_smoke_custom_func(spark):
    # /root/reference/example/custom_image/test.py:7 + my_library.py —
    # defined locally: cloudpickle ships closures/local defs by VALUE,
    # so no module distribution is needed (module-level functions still
    # ride --py-files/addPyFile, the reference custom-image analog)
    def func(x):
        return [i + 1 for i in x]

    assert delayed(func)(range(100)).compute(spark) == list(range(1, 101))


# lambdas: cloudpickle serializes them by value (a module-level def would
# be pickled by reference and need the test module on the workers)
_inc = lambda x: x + 1  # noqa: E731
_add = lambda a, b: a + b  # noqa: E731


def test_dag_nested_and_diamond(spark):
    c = delayed(_inc)(1)
    assert delayed(_add)(c, c).compute(spark) == 4
    d = delayed(_add)(delayed(_inc)(10), delayed(_inc)(20))
    assert d.compute(spark) == 32


def test_containers_of_delayed(spark):
    parts = [delayed(_inc)(i) for i in range(5)]
    total = delayed(sum)(parts)
    assert total.compute(spark) == sum(range(1, 6))
    keyed = delayed(sorted)(list({"a": 3, "b": delayed(_inc)(0)}.values()))
    assert keyed.compute(spark) == [1, 3]
    mapped = delayed(lambda d: d["x"] * d["y"])({"x": delayed(_inc)(2), "y": 10})
    assert mapped.compute(spark) == 30


def test_compute_multiple_outputs(spark):
    a, b = delayed(_inc)(1), delayed(_inc)(2)
    assert compute(a, b, spark=spark) == (2, 3)


_pid = lambda _: __import__("os").getpid()  # noqa: E731


def test_runs_on_worker_not_driver(spark):
    # local-mode executors still use separate Python worker processes
    assert delayed(_pid)(0).compute(spark) != os.getpid()


def test_type_errors():
    with pytest.raises(TypeError):
        delayed(3)
    with pytest.raises(TypeError):
        compute(42)
    with pytest.raises(TypeError):
        delayed(delayed(_inc)(1))
    assert isinstance(delayed(_inc)(1), Delayed)


# --- hostfile bootstrap (reference bin/dask-ssh-docker:50-63 parity) ---


def test_parse_hosts_csv_and_file(tmp_path):
    assert parse_hosts("h1, h2 ,h3") == ["h1", "h2", "h3"]
    hf = tmp_path / "hosts"
    hf.write_text("master.example\nworker1\n\nworker2\n")
    assert parse_hosts(str(hf)) == ["master.example", "worker1", "worker2"]


def test_master_from_hosts_url_and_guard():
    assert master_from_hosts(["m", "w1", "w2"]) == "spark://m:7077"
    assert master_from_hosts(["m", "w"], port=7078) == "spark://m:7078"
    with pytest.raises(ValueError, match="at least two hosts"):
        master_from_hosts(["only-one"])
    with pytest.raises(ValueError, match="at least two hosts"):
        master_from_hosts(["m", "  "])


def test_runner_hosts_single_host_exits_before_session(tmp_path):
    from dask_ssh_docker_spark.runner import main

    hf = tmp_path / "hosts"
    hf.write_text("lonely-host\n")
    with pytest.raises(SystemExit, match="at least two hosts"):
        main(["--hosts", str(hf)])


def test_runner_hosts_master_mutually_exclusive():
    from dask_ssh_docker_spark.runner import main

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--hosts", "a,b", "--master", "local[2]"])


def test_scatter_ref_inside_set_argument(spark):
    # ADVICE r6: the dict scatter marker is unhashable — a ScatterRef in a
    # set arg must ride the hashable tuple marker and still resolve
    from dask_ssh_docker_spark.futures import Client

    client = Client(spark)
    ref = client.scatter(7)
    f = client.submit(lambda s: sum(s), {ref, 1, 2})  # noqa: E731
    assert f.result() == 10
