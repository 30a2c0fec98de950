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
              warmup: int = 2) -> dict | None:
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
        nt_xent_loss,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.nt_xent import (
        nt_xent_loss_pallas,
    )

    fn = nt_xent_loss if impl == "xla" else nt_xent_loss_pallas
    rng = np.random.default_rng(0)
    z_i = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    z_j = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))

    @jax.jit
    def step(a, b):
        loss, (ga, gb) = jax.value_and_grad(
            lambda a_, b_: fn(a_, b_, 0.5), argnums=(0, 1)
        )(a, b)
        return loss, ga, gb

    try:
        for _ in range(warmup):
            out = step(z_i, z_j)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(z_i, z_j)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    except Exception as e:  # OOM at large 2N for the dense path
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    return {"ms": round(dt * 1000, 2), "loss": round(float(out[0]), 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,16384")
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()
    report = {"metric": "nt_xent_value_and_grad_ms", "d": 128, "rows": {}}
    for n in (int(s) for s in a.sizes.split(",")):
        row = {}
        for impl in ("xla", "pallas"):
            row[impl] = bench_one(impl, n, iters=a.iters)
            print(f"2N={2*n} {impl}: {row[impl]}", flush=True)
        report["rows"][2 * n] = row
    print(json.dumps(report))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "proofs", "ntxent_bench.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
