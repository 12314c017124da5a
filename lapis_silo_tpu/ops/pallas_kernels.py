"""Pallas TPU kernels for the HBM-bandwidth-bound hot loops.

The Mutations action is a pure streaming reduction: for every
(symbol, position) row of the plane bank, popcount(row & filter). The
arithmetic intensity is ~1 op/byte, so the ceiling is HBM bandwidth; this
kernel streams row blocks through VMEM against a resident filter block and
accumulates int32 counts (target: >=90% of the chip's HBM roofline,
BASELINE.md).

Falls back to the XLA path (ops/device_engine._mutation_counts_jit) when
Pallas is unavailable for the platform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    HAVE_PALLAS = False

ROW_BLOCK = 256
WORD_BLOCK = 2048


def _popcount_rows_kernel(filter_ref, rows_ref, out_ref):
    """rows_ref [BR, BW] u32, filter_ref [1, BW] u32 -> out_ref [BR, 1] i32,
    accumulated over the word-block grid axis."""
    masked = rows_ref[:] & filter_ref[:]
    counts = jnp.sum(
        jax.lax.population_count(masked).astype(jnp.int32), axis=1, keepdims=True
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += counts


@functools.partial(jax.jit, static_argnums=(2,))
def popcount_rows_and_filter(rows, filter_words, interpret=False):
    """counts[i] = popcount(rows[i] & filter) for a [R, W] u32 row bank.

    R and W must be padded to ROW_BLOCK / WORD_BLOCK multiples by the caller
    (zero padding is exact: zero words contribute nothing).
    """
    n_rows, n_words = rows.shape
    assert n_rows % ROW_BLOCK == 0 and n_words % WORD_BLOCK == 0, (rows.shape,)
    grid = (n_rows // ROW_BLOCK, n_words // WORD_BLOCK)
    out = pl.pallas_call(
        _popcount_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, WORD_BLOCK), lambda i, j: (0, j)),
            pl.BlockSpec((ROW_BLOCK, WORD_BLOCK), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * n_words,
            bytes_accessed=n_rows * n_words * 4,
            transcendentals=0,
        ),
    )(filter_words.reshape(1, n_words), rows)
    return out[:, 0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def mutation_counts_banked(bank, filters, start: int, n_seg_rows: int, n_words: int,
                           row_block: int = ROW_BLOCK, word_block: int | None = None):
    """counts[n_seg_rows]: sum over partitions of popcount(bank_row & filter).

    bank [P, R, W] stays in HBM; the kernel streams row_block x word_block
    tiles through VMEM against the per-partition filter. `start` must be
    row_block-aligned (DeviceEngine aligns segment offsets), W must be a
    lane multiple.
    """
    n_partitions = bank.shape[0]
    start_block = start // row_block
    assert start % row_block == 0 and n_seg_rows % row_block == 0
    if word_block is None:
        # largest lane-aligned block <= WORD_BLOCK that divides n_words
        # exactly — a floor grid would silently drop trailing words (and
        # sequences), and Mosaic requires 128-lane multiples
        word_block = next(
            b for b in range(min(WORD_BLOCK, n_words), 0, -128)
            if b % 128 == 0 and n_words % b == 0
        )
    assert n_words % word_block == 0 and word_block % 128 == 0, (n_words, word_block)
    # reduction axes (partition, word-block) innermost so each output block's
    # revisits are consecutive
    grid = (n_seg_rows // row_block, n_partitions, n_words // word_block)

    def kernel(filter_ref, rows_ref, out_ref):
        masked = rows_ref[0] & filter_ref[0]
        counts = jnp.sum(
            jax.lax.population_count(masked).astype(jnp.int32), axis=1, keepdims=True
        )

        @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += counts

    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    except Exception:  # noqa: BLE001
        compiler_params = None
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, word_block), lambda i, p, j: (p, 0, j)),
            pl.BlockSpec((1, row_block, word_block),
                         lambda i, p, j: (p, start_block + i, j)),
        ],
        out_specs=pl.BlockSpec((row_block, 1), lambda i, p, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_seg_rows, 1), jnp.int32),
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_partitions * n_seg_rows * n_words,
            bytes_accessed=n_partitions * n_seg_rows * n_words * 4,
            transcendentals=0,
        ),
    )(filters.reshape(n_partitions, 1, n_words), bank)
    return out[:, 0]


def pad_to_blocks(rows: np.ndarray) -> np.ndarray:
    r, w = rows.shape
    rp = -(-r // ROW_BLOCK) * ROW_BLOCK
    wp = -(-w // WORD_BLOCK) * WORD_BLOCK
    if (rp, wp) == (r, w):
        return rows
    out = np.zeros((rp, wp), dtype=np.uint32)
    out[:r, :w] = rows
    return out
