"""ADVICE r6: StandaloneCluster.start() must stop every daemon it
already launched when a later launch step fails — the runner's
try/finally only covers post-start failures."""

from __future__ import annotations

import pytest

from dask_ssh_docker_spark import bootstrap
from dask_ssh_docker_spark.bootstrap import StandaloneCluster


def test_start_failure_stops_started_daemons(monkeypatch):
    calls: list[tuple[str, str]] = []

    def fake_run(host, cmd, env):
        script = cmd[0].rsplit("/", 1)[-1]
        calls.append((host, script))
        if script == "start-worker.sh":
            raise RuntimeError("ssh launch failed")

    monkeypatch.setattr(bootstrap, "_run", fake_run)
    monkeypatch.setattr(bootstrap, "_wait_port", lambda *a, **k: None)

    cluster = StandaloneCluster(["h0", "h1"])
    with pytest.raises(RuntimeError, match="ssh launch failed"):
        cluster.start()
    # the already-started master was stopped before the error propagated
    assert ("h0", "stop-master.sh") in calls
    assert cluster._started == []


def test_start_failure_on_master_is_clean(monkeypatch):
    calls: list[tuple[str, str]] = []

    def fake_run(host, cmd, env):
        script = cmd[0].rsplit("/", 1)[-1]
        calls.append((host, script))
        if script == "start-master.sh":
            raise RuntimeError("master launch failed")

    monkeypatch.setattr(bootstrap, "_run", fake_run)
    monkeypatch.setattr(bootstrap, "_wait_port", lambda *a, **k: None)

    cluster = StandaloneCluster(["h0", "h1"])
    with pytest.raises(RuntimeError, match="master launch failed"):
        cluster.start()
    # nothing was recorded as started, so nothing needed stopping
    assert [c for c in calls if c[1].startswith("stop")] == []
