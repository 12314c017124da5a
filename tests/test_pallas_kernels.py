"""Pallas popcount kernel vs numpy, interpret mode (CPU)."""

import numpy as np
import pytest


def test_popcount_rows_matches_numpy():
    from lapis_silo_tpu.ops import pallas_kernels as pk

    if not pk.HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**32, size=(pk.ROW_BLOCK * 2, pk.WORD_BLOCK),
                        dtype=np.uint32)
    filt = rng.integers(0, 2**32, size=pk.WORD_BLOCK, dtype=np.uint32)
    got = np.asarray(pk.popcount_rows_and_filter(rows, filt, True))
    want = np.bitwise_count(rows & filt[None, :]).sum(axis=1).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_pad_to_blocks():
    from lapis_silo_tpu.ops import pallas_kernels as pk

    rows = np.ones((10, 5), dtype=np.uint32)
    padded = pk.pad_to_blocks(rows)
    assert padded.shape == (pk.ROW_BLOCK, pk.WORD_BLOCK)
    assert padded[:10, :5].all() and padded.sum() == 50
