"""Flash-style streaming NT-Xent loss (Pallas TPU kernel + custom VJP).

The reference computes NT-Xent by materializing the dense (2N, 2N)
similarity matrix (``src/models/simclr.py:37-53``) — at 2N = 16k that is a
1 GB f32 intermediate. This kernel keeps only the (2N, D) projections
resident in VMEM and streams (BR, BC) score blocks through the MXU with an
online logsumexp (the flash-attention recurrence applied to contrastive
loss), so peak memory is O(N·D + BR·BC) instead of O(N²):

forward:  per row block R, loop column blocks C:
          S = Z_R · Z_Cᵀ / τ  (MXU)  → self-mask → online (m, l) update,
          plus the positive-pair score gathered when its column lands in C.
          loss_r = −s_pos + m_r + log l_r. Saves (m, l) as residuals.

backward: dL/dZ = (A + Aᵀ) Z / τ with A[r,c] = g_r·(p_rc − 1{c=pos_r}),
          p_rc = exp(s_rc − m_r)/l_r. Score blocks are recomputed; the
          symmetric term uses the *column* rows' saved (m, l, g), so the
          whole backward is one more streamed pass — no dense matrix.

Layout notes (TPU/Mosaic wants rank≥2 vectors): per-row scalars (pos_idx,
m, l, g, loss) travel as (2N, 1) column vectors and all in-kernel reductions
keep dims. Rows with ``pos_idx < 0`` are inert padding, so callers can pad
2N up to tile multiples.

Parity vs the XLA implementation (``models.simclr.nt_xent_loss``) is tested
for values and gradients; off-TPU the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_ids_col(row0, block_r):
    """(BR, 1) int32 global row indices."""
    return row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, 1), 0)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(z_ref, pos_ref, pos_row_ref, loss_ref, m_ref, l_ref, *,
                block_c, n_total, temperature):
    r = pl.program_id(0)
    block_r = loss_ref.shape[0]
    row0 = r * block_r

    z_rows = z_ref[pl.ds(row0, block_r), :]  # (BR, D)
    row_ids = _row_ids_col(row0, block_r)  # (BR, 1)
    pos_idx = pos_ref[pl.ds(row0, block_r), :]  # (BR, 1)

    num_c = n_total // block_c

    def body(c, carry):
        m, l, pos_s = carry  # each (BR, 1)
        col0 = c * block_c
        z_cols = z_ref[pl.ds(col0, block_c), :]  # (BC, D)
        pos_c = pos_row_ref[:, pl.ds(col0, block_c)]  # (1, BC)
        s = (
            jax.lax.dot_general(
                z_rows, z_cols,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / temperature
        )  # (BR, BC)
        col_ids = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_r, block_c), 1
        )
        # mask self-similarity AND dead columns (pos_idx < 0): those are
        # either tail alignment padding (zero vectors whose exp(0/tau - m)
        # would inflate every real row's logsumexp denominator) or rows the
        # caller invalidated (e.g. a wrap-padded final batch).
        s = jnp.where((col_ids == row_ids) | (pos_c < 0), _NEG_INF, s)

        # positive score if its column lands in this block
        hit = col_ids == pos_idx
        pos_s = pos_s + jnp.sum(jnp.where(hit, s, 0.0), axis=1, keepdims=True)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new), axis=1, keepdims=True
        )
        return m_new, l, pos_s

    m0 = jnp.full((block_r, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_r, 1), jnp.float32)
    p0 = jnp.zeros((block_r, 1), jnp.float32)
    m, l, pos_s = jax.lax.fori_loop(0, num_c, body, (m0, l0, p0))

    valid = pos_idx >= 0
    loss_ref[...] = jnp.where(valid, -pos_s + m + jnp.log(l), 0.0)
    m_ref[...] = m
    l_ref[...] = l


def _run_fwd(z, pos_idx, temperature, block_r, block_c):
    n = z.shape[0]
    grid = (n // block_r,)
    out_shapes = (
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # loss rows
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # m
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # l
    )
    kernel = functools.partial(
        _fwd_kernel, block_c=block_c, n_total=n, temperature=temperature
    )
    row_spec = pl.BlockSpec((block_r, 1), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z (n, D) resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pos (n, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pos row layout (1, n)
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(z, pos_idx, pos_idx.reshape(1, n))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(z_ref, pos_ref, m_ref, l_ref, g_ref,
                pos_row_ref, m_row_ref, l_row_ref, g_row_ref,
                dz_ref, *, block_c, n_total, temperature):
    r = pl.program_id(0)
    block_r = dz_ref.shape[0]
    row0 = r * block_r

    z_rows = z_ref[pl.ds(row0, block_r), :]
    row_ids = _row_ids_col(row0, block_r)  # (BR, 1)
    pos_r = pos_ref[pl.ds(row0, block_r), :]  # (BR, 1)
    m_r = m_ref[pl.ds(row0, block_r), :]
    l_r = l_ref[pl.ds(row0, block_r), :]
    g_r = g_ref[pl.ds(row0, block_r), :]  # upstream grad (0 for padding)

    num_c = n_total // block_c

    def body(c, dz):
        col0 = c * block_c
        z_cols = z_ref[pl.ds(col0, block_c), :]
        # column-side vectors pre-transposed on host → direct (1, BC) loads
        pos_c = pos_row_ref[:, pl.ds(col0, block_c)]
        m_c = m_row_ref[:, pl.ds(col0, block_c)]
        l_c = l_row_ref[:, pl.ds(col0, block_c)]
        g_c = g_row_ref[:, pl.ds(col0, block_c)]

        s = (
            jax.lax.dot_general(
                z_rows, z_cols,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / temperature
        )
        col_ids = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_r, block_c), 1
        )
        # exclude self-similarity plus dead rows/columns (pos_idx < 0),
        # mirroring the forward mask
        dead = (col_ids == row_ids) | (pos_c < 0) | (pos_r < 0)

        # row term: A[r, c] = g_r (p_rc - 1{c=pos_r})
        p_rc = jnp.where(dead, 0.0, jnp.exp(s - m_r) / l_r)
        a_rc = g_r * (p_rc - (col_ids == pos_r).astype(jnp.float32))
        # column term: A[c, r] = g_c (p_cr - 1{r=pos_c}); s_cr = s_rc (sym)
        p_cr = jnp.where(dead, 0.0, jnp.exp(s - m_c) / l_c)
        a_cr = g_c * (p_cr - (row_ids == pos_c).astype(jnp.float32))

        coeff = a_rc + a_cr  # (BR, BC)
        dz = dz + jnp.dot(
            coeff, z_cols, preferred_element_type=jnp.float32
        ) / temperature
        return dz

    dz0 = jnp.zeros((block_r, z_rows.shape[1]), jnp.float32)
    dz_ref[...] = jax.lax.fori_loop(0, num_c, body, dz0)


def _run_bwd(z, pos_idx, m, l, g_rows, temperature, block_r, block_c):
    n, d = z.shape
    grid = (n // block_r,)
    kernel = functools.partial(
        _bwd_kernel, block_c=block_c, n_total=n, temperature=temperature
    )
    # row-layout copies of the per-row vectors (host-side transpose is free
    # relative to an in-kernel relayout)
    pos_row = pos_idx.reshape(1, n)
    m_row = m.reshape(1, n)
    l_row = l.reshape(1, n)
    g_row = g_rows.reshape(1, n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec((block_r, d), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=_interpret(),
    )(z, pos_idx, m, l, g_rows, pos_row, m_row, l_row, g_row)


# ---------------------------------------------------------------------------
# custom-VJP op over padded, pre-normalized rows
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _nt_xent_rows(z, pos_idx, temperature, block_r, block_c):
    loss, _m, _l = _run_fwd(z, pos_idx, temperature, block_r, block_c)
    return loss


def _rows_fwd(z, pos_idx, temperature, block_r, block_c):
    loss, m, l = _run_fwd(z, pos_idx, temperature, block_r, block_c)
    return loss, (z, pos_idx, m, l)


def _rows_bwd(temperature, block_r, block_c, res, g):
    z, pos_idx, m, l = res
    # dead rows' forward loss is hard-zeroed, so their upstream cotangent
    # must not leak into the recomputed score pass
    g = g.astype(jnp.float32) * (pos_idx >= 0)
    dz = _run_bwd(z, pos_idx, m, l, g, temperature, block_r, block_c)
    return dz, None


_nt_xent_rows.defvjp(_rows_fwd, _rows_bwd)


def nt_xent_loss_pallas(
    z_i,
    z_j,
    temperature: float = 0.5,
    block_r: int = 128,
    block_c: int = 256,
    valid=None,
):
    """Drop-in replacement for ``models.simclr.nt_xent_loss`` (single-host
    global batch): mean NT-Xent over 2N rows at τ=``temperature``.

    Rows are L2-normalized here (differentiably, in XLA — elementwise) and
    padded to a block multiple; padding rows carry ``pos_idx = -1`` and
    contribute nothing.

    Args:
        valid: optional (n,) bool — rows where ``valid`` is False (e.g. a
            wrap-padded final batch) are excluded from both the loss mean and
            every other row's denominator.
    """
    n = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0).astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)

    total = 2 * n
    pos_idx = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32) + n, jnp.arange(n, dtype=jnp.int32)]
    )
    if valid is not None:
        mask2 = jnp.concatenate([valid, valid]).astype(bool)
        pos_idx = jnp.where(mask2, pos_idx, -1)
        denom = jnp.maximum(jnp.sum(mask2), 1)
    else:
        denom = total

    # Pad rows up to one block_r multiple (never an lcm blowup: 2N=200 with
    # default blocks pads to 256, not 3200), then shrink block_c to a divisor
    # of the padded total so the inner column loop tiles it exactly.
    block_r = min(block_r, max(8, -(-total // 8) * 8))
    padded = -(-total // block_r) * block_r
    block_c = min(block_c, padded)
    while padded % block_c:
        block_c = block_r if block_c > block_r else int(
            np.gcd(block_c, padded)
        )
    pad = padded - total
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, z.shape[1]), z.dtype)])
        pos_idx = jnp.concatenate(
            [pos_idx, jnp.full((pad,), -1, jnp.int32)]
        )

    loss_rows = _nt_xent_rows(
        z, pos_idx[:, None], float(temperature), block_r, block_c
    )
    return jnp.sum(loss_rows) / denom
