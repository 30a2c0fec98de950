"""Uncertainty estimation: softmax thresholding and MC dropout.

Rebuild of ``src/utils/uncertainty.py:5-46`` (knobs at ``src/config.py:33-34``:
SOFTMAX_THRESHOLD=0.7, MONTE_CARLO_SAMPLES=100) — and a real implementation of
the MIL classifier's ``uncertainty_estimation`` TODO stub
(``src/models/mil_classifier.py:56-58``). MC dropout runs as one vmapped
forward over sample keys (a single XLA launch), not a Python loop of N passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    UncertaintyConfig,
)

_DEFAULTS = UncertaintyConfig()


def softmax_thresholding(logits, threshold: float = _DEFAULTS.softmax_threshold):
    """Predictions gated on confidence (``uncertainty.py:5-18``).

    Returns (preds (B,), probs (B, C), confident (B,) bool): ``preds`` is the
    argmax; ``confident`` marks rows whose max probability ≥ threshold.
    """
    probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    confident = jnp.max(probs, axis=-1) >= threshold
    return preds, probs, confident


def monte_carlo_dropout(
    apply_fn,
    variables: dict,
    inputs,
    rng,
    n_samples: int = _DEFAULTS.monte_carlo_samples,
    **apply_kwargs,
):
    """MC-dropout predictive mean and variance (``uncertainty.py:21-46``).

    Args:
        apply_fn: flax apply accepting ``rngs={"dropout": key}`` with
            stochastic dropout enabled (e.g. ``train=True`` on MILClassifier).
        variables: model variables.
        inputs: batch inputs (passed through unchanged).
        rng: PRNG key.
        n_samples: stochastic forward passes.

    Returns:
        (mean_probs (B, C), var_probs (B, C)).
    """
    keys = jax.random.split(rng, n_samples)

    def one_pass(key):
        out = apply_fn(variables, inputs, rngs={"dropout": key}, **apply_kwargs)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    probs = jax.vmap(one_pass)(keys)  # (S, B, C)
    return jnp.mean(probs, axis=0), jnp.var(probs, axis=0)
