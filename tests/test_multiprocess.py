"""Real multi-process collective tests (SURVEY.md §4.5).

Everything else in the suite runs on one process with 8 virtual devices —
that exercises GSPMD partitioning but never moves a byte between
processes. Here we spawn TWO actual ``jax.distributed`` CPU processes
(gloo collectives, 2 local devices each → a global 4-device chain mesh)
and run the sharded sampler + the explicit collectives in
``parallel/collectives.py`` across the process boundary, checking results
against single-process references computed inside each worker
(tests/multiprocess_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(port: int):
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)  # workers pick their own device counts
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", "2"],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_cpu_collectives():
    # _free_port probes then closes, a TOCTOU race under parallel execution:
    # another process can grab the port before the coordinator binds it.
    # Retry the whole spawn on a bind failure with a fresh port.
    for attempt in range(3):
        procs, outs = _spawn_workers(_free_port())
        bind_failed = any(
            p.returncode != 0
            and ("already in use" in out.lower() or "failed to bind" in out.lower())
            for p, out in zip(procs, outs)
        )
        if not bind_failed or attempt == 2:
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER OK pid={i}" in out, f"worker {i} output:\n{out}"
