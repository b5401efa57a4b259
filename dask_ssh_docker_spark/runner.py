"""CLI script runner — the reference's run-anywhere contract, Spark-first.

Replicates the contract of ``/root/reference/bin/dask-ssh-docker:34-99``:

- argv split at ``--``: engine flags before, user script + its args after
  (reference ``:36-44``);
- the runner builds the execution context (there: cluster + default
  ``Client``, ``:66-78``; here: ``SparkSession`` via the session factory)
  so the user script never constructs cluster details;
- script loading: ``sys.argv[0]`` rewritten, script dir prepended to
  ``sys.path``, importlib load, **require** ``main(argv)`` (reference
  ``:81-99``);
- local/cluster transparency (reference ``example/test.py:5-13``): with no
  ``--master``/env the session is ``local[*]``; pointing
  ``SPARK_GRAFT_MASTER`` at a real cluster runs the same script unchanged;
- dependency distribution (reference ``example/custom_image/Dockerfile``):
  ``--py-files`` → ``sc.addPyFile`` per entry (NOT just the
  ``spark.submit.pyFiles`` conf: that conf is only honored by
  ``spark-submit``, and ``getOrCreate`` ignores new conf on an existing
  session — ``addPyFile`` ships the files on a live session regardless of
  how it was built);
- interactive hold (reference ``bin/dask-ssh-docker:71-74``: no script ⇒
  keep the cluster up for a REPL): with no script the runner builds the
  session, prints master/UI info, and blocks — an interactive Python REPL
  with ``spark`` bound on a TTY, else until stdin EOF/ENTER — then tears
  down.

Usage::

    python -m dask_ssh_docker_spark.runner [--master M] [--conf k=v ...]
        [--py-files a.zip,b.py] [script.py [-- script args...]]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

from .session import get_session


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spark-graft",
        description="Run a user script against a SparkSession (local or cluster).",
    )
    p.add_argument("--master", default=None, help="Spark master (default: env/local[*])")
    p.add_argument(
        "--hosts",
        default=None,
        metavar="FILE|h1,h2,...",
        help="hostfile (one host per line) or comma list; first host "
        "becomes spark://host:7077, the rest run workers "
        "(reference bin/dask-ssh-docker hosts contract)",
    )
    p.add_argument(
        "--launch",
        action="store_true",
        help="with --hosts: START a standalone master (first host) and "
        "workers (remaining hosts) before running, stop them after — "
        "the reference's launch-then-run-then-teardown contract "
        "(dask_ssh_docker/__init__.py:199-420); local hosts exec the "
        "sbin scripts directly, remote hosts via ssh",
    )
    p.add_argument(
        "--conf", action="append", default=[], metavar="k=v", help="extra Spark conf"
    )
    p.add_argument(
        "--py-files", default=None, help="comma-separated deps shipped to executors"
    )
    p.add_argument(
        "script",
        nargs="?",
        default=None,
        help="user script defining main(argv); omit to hold an interactive session",
    )
    p.add_argument("script_args", nargs="*", help="args after -- go to the script")
    return p


def _hold(spark) -> int:
    """No-script hold mode (reference ``bin/dask-ssh-docker:71-74``): keep
    the session alive for interactive use, tear down on exit."""
    sc = spark.sparkContext
    ui = sc.uiWebUrl or "(ui disabled)"
    print(f"spark-graft session up: master={sc.master} appId={sc.applicationId}")
    print(f"web UI: {ui}")
    if sys.stdin.isatty():
        import code

        code.interact(
            banner="Interactive hold — `spark` is bound; exit() to tear down.",
            local={"spark": spark},
        )
    else:
        print("holding; press ENTER (or close stdin) to tear down")
        try:
            sys.stdin.readline()
        except KeyboardInterrupt:
            pass
    print("tearing down session")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # split at `--`: everything after belongs to the user script verbatim
    if "--" in argv:
        i = argv.index("--")
        ours, theirs = argv[:i], argv[i + 1 :]
    else:
        ours, theirs = argv, []
    args = build_parser().parse_args(ours)
    script_args = list(args.script_args) + theirs

    cluster = None
    if args.hosts:
        if args.master:
            raise SystemExit("--hosts and --master are mutually exclusive")
        from .session import master_from_hosts, parse_hosts

        try:
            hosts = parse_hosts(args.hosts)
            args.master = master_from_hosts(hosts)
        except ValueError as e:
            raise SystemExit(str(e))
        if args.launch:
            from .bootstrap import StandaloneCluster

            cluster = StandaloneCluster(hosts)
            cluster.start()
    elif args.launch:
        raise SystemExit("--launch requires --hosts")

    conf = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        if not v:
            raise SystemExit(f"--conf expects k=v, got: {kv!r}")
        conf[k] = v
    if args.py_files:
        conf["spark.submit.pyFiles"] = args.py_files

    app_name = os.path.basename(args.script) if args.script else "spark-graft-hold"
    spark = get_session(app_name=app_name, master=args.master, conf=conf)
    try:
        if args.py_files:
            # The conf above only matters under spark-submit; on a
            # programmatically built (or pre-existing getOrCreate'd)
            # session, addPyFile is what actually ships deps to executors.
            for dep in args.py_files.split(","):
                if dep.strip():
                    spark.sparkContext.addPyFile(dep.strip())

        if args.script is None:
            if script_args:
                raise SystemExit("script args given but no script (hold mode)")
            return _hold(spark)

        script_path = os.path.abspath(args.script)
        if not os.path.exists(script_path):
            raise SystemExit(f"script not found: {args.script}")
        # reference contract: argv[0] = script, script dir importable
        sys.argv = [script_path] + script_args
        sys.path.insert(0, os.path.dirname(script_path))
        spec = importlib.util.spec_from_file_location("__spark_graft_script__", script_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if not hasattr(mod, "main"):
            raise SystemExit(
                f"{args.script} must define main(argv) (run-anywhere contract)"
            )
        ret = mod.main(script_args)
        return int(ret) if isinstance(ret, int) else 0
    finally:
        spark.stop()
        if cluster is not None:  # tear down only what --launch started
            cluster.stop()


if __name__ == "__main__":
    raise SystemExit(main())
