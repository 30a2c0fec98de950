#!/usr/bin/env python
"""NT-Xent loss implementations on the real chip: XLA dense vs Pallas
streaming, value+grad step time across batch sizes.

The XLA path materializes the dense (2N, 2N) similarity matrix
(``models/simclr.py``, mirroring ``/root/reference/src/models/simclr.py:31-54``);
the Pallas kernel streams score blocks with an online logsumexp
(``ops/pallas/nt_xent.py``) — O(N·D) memory, HBM-streamed projections, so
it scales past the dense path's memory wall. This script decides the
production default (``config.SimCLRConfig.loss_impl``).

Usage: python scripts/ntxent_bench.py [--sizes 4096,8192,16384,32768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(impl: str, n: int, d: int = 128, iters: int = 10,
              warmup: int = 2, blocks: tuple[int, int] | None = None) -> dict | None:
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
        nt_xent_loss,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.nt_xent import (
        nt_xent_loss_pallas,
    )

    if impl == "xla":
        fn = nt_xent_loss
    elif blocks is not None:
        fn = functools.partial(
            nt_xent_loss_pallas, block_r=blocks[0], block_c=blocks[1]
        )
    else:
        fn = nt_xent_loss_pallas
    rng = np.random.default_rng(0)
    z_i = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    z_j = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))

    # Timing methodology (round-4, replacing two broken generations):
    # 1. All iterations run inside ONE dispatch (lax.scan) with each
    #    iteration chained on the previous loss, and the timed quantity
    #    ends in a SCALAR HOST FETCH — under the tunneled axon platform
    #    ``jax.block_until_ready`` returns before execution completes
    #    (measured: a 10x 51-GFLOP scan "finished" in 60 us), which is
    #    what produced the physically impossible 0.01 ms round-3 reading.
    #    Only a fetch forces the device.
    # 2. The fetch-to-fetch wall still carries ~30-50 ms of fixed tunnel
    #    overhead, so the per-iteration kernel time is DIFFERENCED from
    #    scans of length L and 2L: k = (t_2L - t_L) / L, min over
    #    ``reps`` repetitions of each.
    def make_steps(length):
        @jax.jit
        def steps(a, b):
            def body(carry, _):
                loss_prev, ga_acc, gb_acc = carry
                a_ = a + 1e-30 * loss_prev
                loss, (ga, gb) = jax.value_and_grad(
                    lambda x, y: fn(x, y, 0.5), argnums=(0, 1)
                )(a_, b)
                return (loss, ga_acc + ga, gb_acc + gb), None
            init = (jnp.float32(0), jnp.zeros_like(a), jnp.zeros_like(b))
            (loss, ga, gb), _ = lax.scan(body, init, None, length=length)
            # single scalar carrying a dependency on every output
            return loss + 0.0 * (jnp.sum(ga) + jnp.sum(gb))
        return steps

    reps = 3
    try:
        s1, s2 = make_steps(iters), make_steps(2 * iters)
        for _ in range(warmup):
            float(s1(z_i, z_j))
            float(s2(z_i, z_j))
        t1s, t2s = [], []
        loss = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            loss = float(s1(z_i, z_j))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(s2(z_i, z_j))
            t2s.append(time.perf_counter() - t0)
    except Exception as e:  # OOM at large 2N for the dense path
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    dt = (min(t2s) - min(t1s)) / iters
    row = {"ms": round(dt * 1000, 3), "loss": round(loss, 4),
           "wall_ms_scan_1x": round(min(t1s) * 1000, 1),
           "wall_ms_scan_2x": round(min(t2s) * 1000, 1)}
    if dt <= 0:
        row["implausible"] = (
            "doubled scan not slower than single - tunnel noise exceeds "
            "kernel time at this size; treat ms as unresolved"
        )
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,16384")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweep_blocks", default=None,
                    help="comma-separated BRxBC pairs to sweep for the "
                         "pallas impl, e.g. 128x256,256x512,256x1024")
    ap.add_argument("--out", default=None,
                    help="report path (default docs/proofs/ntxent_bench.json)")
    a = ap.parse_args()
    report = {"metric": "nt_xent_value_and_grad_ms", "d": 128, "rows": {}}
    sweep = None
    if a.sweep_blocks:
        sweep = [
            tuple(int(v) for v in pair.split("x"))
            for pair in a.sweep_blocks.split(",")
        ]
    for n in (int(s) for s in a.sizes.split(",")):
        row = {}
        for impl in ("xla", "pallas"):
            row[impl] = bench_one(impl, n, iters=a.iters)
            print(f"2N={2*n} {impl}: {row[impl]}", flush=True)
        if sweep:
            for br, bc in sweep:
                key = f"pallas_{br}x{bc}"
                row[key] = bench_one("pallas", n, iters=a.iters,
                                     blocks=(br, bc))
                print(f"2N={2*n} {key}: {row[key]}", flush=True)
        report["rows"][2 * n] = row
    print(json.dumps(report))
    out = a.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "proofs", "ntxent_bench.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
