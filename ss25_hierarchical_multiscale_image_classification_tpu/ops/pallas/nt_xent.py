"""Flash-style streaming NT-Xent loss (Pallas TPU kernel + custom VJP).

The reference computes NT-Xent by materializing the dense (2N, 2N)
similarity matrix (``src/models/simclr.py:37-53``) — at 2N = 16k that is a
1 GB f32 intermediate. This kernel streams (BR, BC) score blocks through
the MXU with an online logsumexp (the flash-attention recurrence applied
to contrastive loss), so peak *device* memory for the loss is O(N·D) in
HBM and only O(BR·D + BC·D + BR·BC) in VMEM:

forward:  grid (R, C), C fastest. Per (R, C) step Pallas pipelines the
          Z row-block and Z column-block HBM→VMEM (double-buffered
          automatically by the grid pipeline — Z is NOT VMEM-resident, so
          2N is bounded by HBM, not the ~128 MB VMEM ceiling that capped
          the round-2 kernel at ~30k rows):
          S = Z_R · Z_Cᵀ / τ  (MXU)  → self-mask → online (m, l) update
          in VMEM scratch carried across C, plus the positive-pair score
          gathered when its column lands in C. At the last C:
          loss_r = −s_pos + m_r + log l_r; saves (m, l) as residuals.

backward: same grid; dL/dZ = (A + Aᵀ) Z / τ with
          A[r,c] = g_r·(p_rc − 1{c=pos_r}), p_rc = exp(s_rc − m_r)/l_r.
          Score blocks are recomputed; the symmetric term uses the
          *column* rows' saved (m, l, g), so the whole backward is one
          more streamed pass — no dense matrix; dZ accumulates in VMEM
          scratch and writes at the last C.

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


def _fwd_kernel(z_row_ref, z_col_ref, pos_ref, pos_row_ref,
                loss_ref, m_out_ref, l_out_ref,
                m_sc, l_sc, ps_sc, *, num_c, temperature):
    r, c = pl.program_id(0), pl.program_id(1)
    block_r = loss_ref.shape[0]
    block_c = z_col_ref.shape[0]
    row0 = r * block_r
    col0 = c * block_c

    @pl.when(c == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        ps_sc[...] = jnp.zeros_like(ps_sc)

    z_rows = z_row_ref[...]  # (BR, D) — streamed block
    z_cols = z_col_ref[...]  # (BC, D) — streamed block
    row_ids = _row_ids_col(row0, block_r)  # (BR, 1)
    pos_idx = pos_ref[...]  # (BR, 1)
    pos_c = pos_row_ref[...]  # (1, BC)

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
    ps_sc[...] += jnp.sum(jnp.where(hit, s, 0.0), axis=1, keepdims=True)

    m = m_sc[...]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    l_sc[...] = l_sc[...] * jnp.exp(m - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_sc[...] = m_new

    @pl.when(c == num_c - 1)
    def _finish():
        valid = pos_idx >= 0
        m_f, l_f = m_sc[...], l_sc[...]
        loss_ref[...] = jnp.where(
            valid, -ps_sc[...] + m_f + jnp.log(l_f), 0.0
        )
        m_out_ref[...] = m_f
        l_out_ref[...] = l_f


def _run_fwd(z, pos_idx, temperature, block_r, block_c):
    n, d = z.shape
    num_c = n // block_c
    grid = (n // block_r, num_c)
    out_shapes = (
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # loss rows
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # m
        jax.ShapeDtypeStruct((n, 1), jnp.float32),  # l
    )
    kernel = functools.partial(
        _fwd_kernel, num_c=num_c, temperature=temperature
    )
    row_spec = pl.BlockSpec((block_r, 1), lambda r, c: (r, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda r, c: (r, 0)),  # Z row block
            pl.BlockSpec((block_c, d), lambda r, c: (c, 0)),  # Z col block
            pl.BlockSpec((block_r, 1), lambda r, c: (r, 0)),  # pos (col vec)
            pl.BlockSpec((1, block_c), lambda r, c: (0, c)),  # pos (row vec)
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((block_r, 1), jnp.float32)] * 3,
        interpret=_interpret(),
    )(z, z, pos_idx, pos_idx.reshape(1, n))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(z_row_ref, z_col_ref, pos_ref, m_ref, l_ref, g_ref,
                pos_row_ref, m_row_ref, l_row_ref, g_row_ref,
                dz_ref, acc_sc, *, num_c, temperature):
    r, c = pl.program_id(0), pl.program_id(1)
    block_r = dz_ref.shape[0]
    block_c = z_col_ref.shape[0]
    row0 = r * block_r
    col0 = c * block_c

    @pl.when(c == 0)
    def _init():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    z_rows = z_row_ref[...]
    z_cols = z_col_ref[...]
    row_ids = _row_ids_col(row0, block_r)  # (BR, 1)
    pos_r = pos_ref[...]  # (BR, 1)
    m_r = m_ref[...]
    l_r = l_ref[...]
    g_r = g_ref[...]  # upstream grad (0 for padding)
    # column-side vectors pre-transposed on host → direct (1, BC) loads
    pos_c = pos_row_ref[...]
    m_c = m_row_ref[...]
    l_c = l_row_ref[...]
    g_c = g_row_ref[...]

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
    acc_sc[...] += jnp.dot(
        coeff, z_cols, preferred_element_type=jnp.float32
    ) / temperature

    @pl.when(c == num_c - 1)
    def _finish():
        dz_ref[...] = acc_sc[...]


def _run_bwd(z, pos_idx, m, l, g_rows, temperature, block_r, block_c):
    n, d = z.shape
    num_c = n // block_c
    grid = (n // block_r, num_c)
    kernel = functools.partial(
        _bwd_kernel, num_c=num_c, temperature=temperature
    )
    # row-layout copies of the per-row vectors (host-side transpose is free
    # relative to an in-kernel relayout)
    pos_row = pos_idx.reshape(1, n)
    m_row = m.reshape(1, n)
    l_row = l.reshape(1, n)
    g_row = g_rows.reshape(1, n)
    col_vec = pl.BlockSpec((block_r, 1), lambda r, c: (r, 0))
    row_vec = pl.BlockSpec((1, block_c), lambda r, c: (0, c))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda r, c: (r, 0)),  # Z row block
            pl.BlockSpec((block_c, d), lambda r, c: (c, 0)),  # Z col block
            col_vec,  # pos
            col_vec,  # m
            col_vec,  # l
            col_vec,  # g
            row_vec,  # pos (row layout)
            row_vec,  # m
            row_vec,  # l
            row_vec,  # g
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda r, c: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_r, d), jnp.float32)],
        interpret=_interpret(),
    )(z, z, pos_idx, m, l, g_rows, pos_row, m_row, l_row, g_row)


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
    block_r: int = 256,
    block_c: int = 1024,
    valid=None,
):
    """Drop-in replacement for ``models.simclr.nt_xent_loss`` (single-host
    global batch): mean NT-Xent over 2N rows at τ=``temperature``.

    Rows are L2-normalized here (differentiably, in XLA — elementwise) and
    padded to a block multiple; padding rows carry ``pos_idx = -1`` and
    contribute nothing.

    Default blocks (256, 1024) are the round-4 v5e sweep winner
    (``scripts/ntxent_bench.py --sweep_blocks``): vs the round-3
    (128, 256) defaults the grid shrinks 16x, amortizing per-step
    overheads — 2N=32768 value+grad went 32.3 → 13.5 ms (XLA dense:
    32.1 ms). VMEM per step stays ~2 MB, well under the ~16 MB/core
    budget.

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
