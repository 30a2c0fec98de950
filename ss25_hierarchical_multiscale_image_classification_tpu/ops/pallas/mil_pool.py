"""Streaming masked MIL attention pooling (Pallas, inference path).

A slide can contribute ~10^4+ instances (SURVEY.md §5 "long-context"
analogue); the XLA path materializes (B, K) attention plus (B, K, H) tanh
activations. This kernel streams instance blocks through VMEM with an online
softmax (same recurrence as the NT-Xent kernel), computing

    a_k = w · tanh(h_k V),   bag = Σ_k softmax(a)_k · h_k

in one pass per bag without materializing per-instance intermediates in HBM.
Padded slots (mask=False) contribute −inf logits. Forward-only: training
uses the XLA module (``models.mil``); this op serves slide-scale inference.

Parity vs ``models.mil.MILAttentionPooling`` is tested in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(h_ref, mask_ref, v_ref, vb_ref, w_ref, bag_ref, *, block_k):
    # one bag per grid step: h (K, D), mask (K, 1), V (D, H), vb (1, H),
    # w (H, 1)
    K, D = h_ref.shape
    num_k = K // block_k

    def body(k, carry):
        m, l, acc = carry  # scalars as (1,1), acc (1, D)
        k0 = k * block_k
        h = h_ref[pl.ds(k0, block_k), :]  # (BK, D)
        msk = mask_ref[pl.ds(k0, block_k), :]  # (BK, 1)
        t = jnp.tanh(
            jax.lax.dot_general(
                h, v_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + vb_ref[...]
        )  # (BK, H)
        a = jax.lax.dot_general(
            t, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, 1)
        a = jnp.where(msk > 0, a, _NEG_INF)

        m_blk = jnp.max(a, axis=0, keepdims=True)  # (1, 1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(a - m_new)  # (BK, 1)
        scale = jnp.exp(m - m_new)  # (1, 1)
        l = l * scale + jnp.sum(p, axis=0, keepdims=True)
        acc = acc * scale + jax.lax.dot_general(
            p, h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, D)
        return m_new, l, acc

    m0 = jnp.full((1, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, 1), jnp.float32)
    acc0 = jnp.zeros((1, D), jnp.float32)
    _m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    # output ref holds ALL bags (full-array spec: a (1, D) block would
    # violate the 8-sublane tiling rule); each grid step writes its row
    i = pl.program_id(0)
    bag_ref[pl.ds(i, 1), :] = acc / jnp.maximum(l, 1e-30)


def mil_attention_pool_pallas(h, mask, v, w, v_bias=None, block_k: int = 512):
    """Masked attention pooling over padded bags.

    Args:
        h: (B, K, D) float instance features.
        mask: (B, K) bool, True = real instance.
        v: (D, H) attention projection (``MILAttentionPooling`` "V" kernel).
        w: (H,) scoring vector ("w" kernel).
        v_bias: optional (H,) bias of the V projection.
        block_k: instance-block size (K must be a multiple or smaller).

    Returns:
        (B, D) float32 pooled bags (identical to the XLA module's output).
    """
    b, k, d = h.shape
    block_k = min(block_k, k)
    if k % block_k:
        raise ValueError(f"bag size {k} not a multiple of block {block_k}")
    h = h.astype(jnp.float32)
    mask2 = mask.astype(jnp.float32)[..., None]  # (B, K, 1)
    v = v.astype(jnp.float32)
    hdim = v.shape[1]
    vb = (
        jnp.zeros((1, hdim), jnp.float32)
        if v_bias is None
        else v_bias.astype(jnp.float32).reshape(1, hdim)
    )
    w = w.astype(jnp.float32).reshape(-1, 1)  # (H, 1)

    kernel = functools.partial(_kernel, block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # None squeezes the bag dim: kernel refs are (K, D) / (K, 1)
            pl.BlockSpec((None, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=_interpret(),
    )(h.reshape(b, k, d), mask2, v, vb, w)
