"""True multi-process (DCN-analogue) validation.

The virtual 8-device CPU mesh used everywhere else is single-process;
these tests spawn TWO OS processes, each owning 2 virtual CPU devices,
joined by ``jax.distributed.initialize`` (Gloo collectives) — the same
runtime model a multi-host TPU slice uses across DCN. Validates the
``parallel/feed.py`` process-local feed and cross-process gradient
synchronization of the DP train step end to end.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step_stays_in_sync():
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT rank=(\d+) loss=([\d.eE+-]+) digest=([\d.eE+-]+)", out
        )
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), m.group(3))

    assert set(results) == {0, 1}
    # same loss (computed over the same global batch) and bit-identical
    # replicated params after the cross-process gradient all-reduce
    assert results[0][0] == pytest.approx(results[1][0], abs=1e-6)
    assert results[0][1] == results[1][1]


def test_four_process_simclr_nt_xent_all_gather():
    """NT-Xent across FOUR processes (8 virtual devices): the global
    similarity matrix forces an all-gather of projection shards across
    process boundaries — the collective that rides DCN on a production
    multi-host slice. Loss and per-shard gradients must match a purely
    local evaluation of the full batch."""
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    nproc = 4
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), str(nproc), str(port),
             "simclr"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT rank=(\d+) loss=([\d.eE+-]+) ref=([\d.eE+-]+)"
            r" graderr=([\d.eE+-]+) digest=([\d.eE+-]+)",
            out,
        )
        assert m, out
        results[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), float(m.group(4)),
        )

    assert set(results) == set(range(nproc))
    for rank, (loss, ref, graderr) in results.items():
        assert loss == pytest.approx(ref, abs=1e-5), (rank, loss, ref)
        assert graderr < 1e-5, (rank, graderr)
    # every rank computed the SAME global loss
    losses = {round(v[0], 5) for v in results.values()}
    assert len(losses) == 1, results
