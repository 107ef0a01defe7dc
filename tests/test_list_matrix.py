"""Unit tests for the shared zero-copy list→matrix helper (round-4
verdict item #1): every corpus-scaled ANN/dedup/cluster stage unpacks
its embedding column through this ONE code path, so its contract —
no per-row Python, loud failure on NULL/ragged rows — is pinned here."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from jsonld_js_ray.rayutil import embedding_batch, list_col_matrix


def _ref(rows):
    return np.stack([np.asarray(r, np.float64) for r in rows])


def test_matches_per_row_reference():
    rows = [[1.0, 2.0, 3.0], [4.5, -1.0, 0.0], [7.0, 8.0, 9.0]]
    m = list_col_matrix(pa.array(rows, pa.list_(pa.float64())))
    np.testing.assert_array_equal(m, _ref(rows))


def test_chunked_and_float32():
    rows_a, rows_b = [[1.0, 2.0]], [[3.0, 4.0], [5.0, 6.0]]
    col = pa.chunked_array([
        pa.array(rows_a, pa.list_(pa.float32())),
        pa.array(rows_b, pa.list_(pa.float32()))])
    m = list_col_matrix(col)
    assert m.dtype == np.float64
    np.testing.assert_array_equal(m, _ref(rows_a + rows_b))


def test_fixed_size_list():
    rows = [[1.0, 2.0], [3.0, 4.0]]
    col = pa.array(rows, pa.list_(pa.float64(), 2))
    np.testing.assert_array_equal(list_col_matrix(col), _ref(rows))


def test_zero_copy_no_python_rows():
    """The float64 no-null path is a VIEW of the Arrow values buffer —
    the strongest proof there is no per-row conversion anywhere."""
    rows = [[float(i), float(i + 1)] for i in range(100)]
    col = pa.array(rows, pa.list_(pa.float64()))
    m = list_col_matrix(col)
    flat = col.flatten().to_numpy(zero_copy_only=True)
    assert np.shares_memory(m, flat)


def test_sliced_array_respects_offset():
    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]]
    col = pa.array(rows, pa.list_(pa.float64())).slice(1, 2)
    np.testing.assert_array_equal(list_col_matrix(col), _ref(rows[1:3]))


def test_sliced_fixed_size_list_respects_offset():
    # .values on a sliced FixedSizeListArray returns ALL child values
    # (offset-blind); the kernel must use .flatten(). Ray serves
    # zero-copy sliced batches, so this is a real production shape.
    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]]
    col = pa.array(rows, pa.list_(pa.float64(), 2)).slice(1, 2)
    np.testing.assert_array_equal(list_col_matrix(col), _ref(rows[1:3]))


def test_null_row_raises():
    col = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="NULL"):
        list_col_matrix(col)


def test_ragged_rows_raise():
    # sums to n*d (1+3 = 2*2) — the length check must be per-row
    col = pa.array([[1.0], [2.0, 3.0, 4.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        list_col_matrix(col)


def test_empty_column():
    col = pa.array([], pa.list_(pa.float64()))
    assert list_col_matrix(col).shape == (0, 0)


def test_embedding_batch_unpack():
    batch = pa.table({
        "vec_id": pa.array([7, 8], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float64())),
    })
    ids, mat = embedding_batch(batch)
    np.testing.assert_array_equal(ids, [7, 8])
    np.testing.assert_array_equal(mat, np.eye(2))
