"""Guard the driver-facing benchmark harness (bench.py).

The driver runs ``python bench.py`` at end of round and records its one
JSON line; a regression here silently zeroes the round's headline number
(it did in round 3). These tests cover the host-side machinery on CPU —
the scan-differenced timer, result parsing, and the parent's
best-completed-measurement merge — without needing the TPU.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import bench


def test_scan_rate_returns_positive_per_iter_time():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(64, 64)),
                    jnp.float32)

    def scalar_step(w, x, carry):
        xi = x + (carry * 0).astype(x.dtype)
        return jnp.sum(xi @ w).astype(jnp.float32)

    per_iter = bench._scan_rate(scalar_step, w, x, iters=4, reps=2)
    assert per_iter > 0.0
    assert per_iter < 1.0  # a 64x64 matmul is nowhere near 1 s/iter


def test_scan_rate_body_not_dead_coded():
    # if XLA dead-coded the body, a 100x heavier fn would time the same;
    # on CPU the contrast is large enough to assert an ordering
    x = jnp.ones((256, 256), jnp.float32)
    w = jnp.ones((256, 256), jnp.float32)

    def light(w, x, carry):
        return (jnp.sum(x[0, :8]) + carry * 0).astype(jnp.float32)

    def heavy(w, x, carry):
        xi = x + (carry * 0).astype(x.dtype)
        y = xi
        for _ in range(8):
            y = y @ w
        return jnp.sum(y).astype(jnp.float32)

    t_light = bench._scan_rate(light, w, x, iters=8, reps=2)
    t_heavy = bench._scan_rate(heavy, w, x, iters=8, reps=2)
    assert t_heavy > t_light


def test_parse_result_takes_last_json_line():
    out = "\n".join([
        "garbage",
        json.dumps({"metric": "a", "value": 1.0}),
        "# comment",
        json.dumps({"metric": "b", "value": 2.0}),
    ])
    parsed = bench._parse_result(out)
    assert parsed == {"metric": "b", "value": 2.0}
    assert bench._parse_result("no json here") is None


def test_parent_merges_int8_into_float_result(monkeypatch):
    results = {
        "--child-float": {"metric": "float_m", "value": 30000.0,
                          "unit": "p/s", "vs_baseline": 1.5},
        "--child-int8": {"metric": "int8_m", "value": 50000.0,
                         "unit": "p/s", "vs_baseline": 2.5},
    }
    monkeypatch.setattr(
        bench, "_phase_with_retries",
        lambda flag, extra, t0, budget: results[flag],
    )
    printed = []
    monkeypatch.setattr(
        "builtins.print", lambda *a, **k: printed.append(a[0]))
    bench._parent_main([])
    merged = json.loads(printed[-1])
    assert merged["value"] == 30000.0
    assert merged["int8_value"] == 50000.0
    assert merged["int8_vs_baseline"] == 2.5


def test_parent_reports_int8_when_float_phase_dies(monkeypatch):
    def phases(flag, extra, t0, budget):
        if flag == "--child-float":
            return None
        return {"metric": "int8_m", "value": 50000.0, "unit": "p/s",
                "vs_baseline": 2.5}

    monkeypatch.setattr(bench, "_phase_with_retries", phases)
    printed = []
    monkeypatch.setattr(
        "builtins.print", lambda *a, **k: printed.append(a[0]))
    bench._parent_main([])
    merged = json.loads(printed[-1])
    assert merged["value"] == 50000.0
    assert "float_error" in merged


def test_parent_emits_error_line_when_everything_fails(monkeypatch):
    monkeypatch.setattr(
        bench, "_phase_with_retries", lambda flag, extra, t0, budget: None)
    printed = []
    monkeypatch.setattr(
        "builtins.print", lambda *a, **k: printed.append(a[0]))
    bench._parent_main([])
    merged = json.loads(printed[-1])
    assert merged["value"] == 0.0
    assert "error" in merged
