"""One-command standalone-cluster bootstrap — the reference's core value.

The reference's whole reason to exist is that ``dask-ssh-docker
hostfile script.py`` LAUNCHES the scheduler and workers before running
the user script and tears them down afterwards
(``/root/reference/dask_ssh_docker/__init__.py:199-302`` starts the
scheduler, ``:305-420`` the workers, over asyncssh+docker).  The Spark
analog: start a standalone master on ``hosts[0]`` and one worker per
remaining host with the ``sbin`` scripts every Spark distribution
ships, wait for the master port, and stop exactly what was started when
the run ends.

Transport: local hosts (``localhost``/``127.0.0.1``/this machine's
hostname) exec the scripts directly; remote hosts go through ``ssh``
(the reference's transport, minus docker — images are a cluster-manager
concern, SURVEY §7).  Remote commands require passwordless ssh and a
Spark installation at the same ``SPARK_HOME`` on every host, the same
operational preconditions the reference documents for its SSH path.

This is deliberately NOT a cluster manager: no supervision, no
restarts, no elasticity — hosts in, running cluster out, torn down on
exit, exactly the reference's contract.  Anything more belongs to a
real deployment (standalone HA, YARN, Kubernetes).
"""

from __future__ import annotations

import os
import socket
import subprocess
import time


def _spark_sbin() -> str:
    """Locate the standalone launch scripts (sbin) of this Spark install."""
    candidates = []
    if os.environ.get("SPARK_HOME"):
        candidates.append(os.path.join(os.environ["SPARK_HOME"], "sbin"))
    candidates.append("/opt/spark/sbin")
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "sbin")
        )
    except ImportError:  # pragma: no cover
        pass
    for c in candidates:
        if os.path.exists(os.path.join(c, "start-master.sh")):
            return c
    raise RuntimeError(
        "no Spark sbin/start-master.sh found (checked: "
        + ", ".join(candidates)
        + "); --launch needs a full Spark distribution"
    )


def _is_local(host: str) -> bool:
    return host in ("localhost", "127.0.0.1", socket.gethostname())


def _run(host: str, cmd: list[str], env: dict[str, str]) -> None:
    """Exec ``cmd`` on ``host`` — directly when local, via ssh otherwise
    (env vars are inlined into the remote command line; ssh does not
    forward the local environment)."""
    if _is_local(host):
        subprocess.run(cmd, env={**os.environ, **env}, check=True, capture_output=True)
    else:  # reference transport parity (asyncssh there, OpenSSH client here)
        assigns = " ".join(f"{k}={v!r}" for k, v in env.items())
        remote = assigns + " " + " ".join(cmd)
        subprocess.run(
            ["ssh", "-o", "BatchMode=yes", host, remote],
            check=True,
            capture_output=True,
        )


def _wait_port(host: str, port: int, timeout: float = 60.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        with socket.socket() as s:
            s.settimeout(1.0)
            if s.connect_ex((host, port)) == 0:
                return
        time.sleep(0.5)
    raise TimeoutError(f"standalone master did not open {host}:{port}")


class StandaloneCluster:
    """Launch (and later stop) a standalone master + workers over a host
    list — ``hosts[0]`` runs the master, every other entry one worker
    (the reference's hostfile layout: first line scheduler, rest
    workers).  Use as a context manager; only daemons this object
    started are stopped."""

    def __init__(self, hosts: list[str], port: int = 7077, env: dict[str, str] | None = None):
        if len(hosts) < 2:
            raise ValueError(
                "need >= 2 hosts (master + >= 1 worker) — the reference "
                "enforces the same (bin/dask-ssh-docker:50-57)"
            )
        self.hosts = hosts
        self.port = port
        self.env = dict(env or {})
        self.sbin = _spark_sbin()
        self.master_url = f"spark://{hosts[0]}:{port}"
        self._started: list[tuple[str, str]] = []  # (host, role)

    def start(self) -> str:
        # self-cleaning: a failure mid-start (say a worker's ssh launch
        # after the master daemon is already up) stops every daemon this
        # object managed to start before re-raising — callers never
        # inherit a half-started cluster.
        try:
            env = {
                "SPARK_MASTER_HOST": self.hosts[0],
                "SPARK_MASTER_PORT": str(self.port),
                **self.env,
            }
            _run(self.hosts[0], [f"{self.sbin}/start-master.sh"], env)
            self._started.append((self.hosts[0], "master"))
            _wait_port(self.hosts[0], self.port)
            # A host listed N times runs N worker instances — the
            # reference's Makefile runs exactly this layout (2× localhost,
            # example/custom_image/Makefile:2-6).  Spark's own sbin
            # scripts multiplex via SPARK_WORKER_INSTANCES (start AND
            # stop honor it), so one start call per UNIQUE host launches
            # all of its instances with non-conflicting ports.
            counts: dict[str, int] = {}
            for host in self.hosts[1:]:
                counts[host] = counts.get(host, 0) + 1
            for host, n_inst in counts.items():
                wenv = (
                    {**env, "SPARK_WORKER_INSTANCES": str(n_inst)}
                    if n_inst > 1
                    else env
                )
                _run(host, [f"{self.sbin}/start-worker.sh", self.master_url], wenv)
                self._started.append((host, f"worker:{n_inst}"))
            return self.master_url
        except BaseException:
            self.stop()
            raise

    def stop(self) -> None:
        # workers first, master last; never raise during teardown
        for host, role in reversed(self._started):
            if role.startswith("worker"):
                script = "stop-worker.sh"
                n_inst = int(role.split(":")[1]) if ":" in role else 1
                env = (
                    {**self.env, "SPARK_WORKER_INSTANCES": str(n_inst)}
                    if n_inst > 1
                    else self.env
                )
            else:
                script, env = "stop-master.sh", self.env
            try:
                _run(host, [f"{self.sbin}/{script}"], env)
            except Exception:  # pragma: no cover - best-effort teardown
                pass
        self._started.clear()

    def __enter__(self) -> "StandaloneCluster":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
