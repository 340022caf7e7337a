"""The deferred GEV worker: parity with inline refinement + error propagation.

The orchestrators hand flagged-row refinement to ``_DeferredGEV`` (a
single worker thread) so the batched host MLE overlaps packing/dispatch
of later tiles (``inference/ht.py``).  These tests pin down the contract:
results identical to the old inline ``_refine_rows`` path, disjoint-row
writes compose across tiles, and worker exceptions surface in
``finish()`` rather than disappearing on the thread.
"""

import numpy as np
import pytest

from memento_tpu.inference.ht import _DeferredGEV, _refine_rows


def _make_case(rng, m, b):
    stats = rng.normal(0.8, 0.1, m)
    nulls = rng.normal(0.0, 0.25, (m, b)) + stats[:, None]
    rows = np.concatenate([stats[:, None], nulls], axis=1)
    return rows


def test_deferred_matches_inline_refinement():
    rng = np.random.default_rng(0)
    b = 400
    pvals = np.full((8, 2), 11 / b)
    gi = np.array([0, 1, 3, 5, 7])
    gk = np.array([0, 1, 0, 1, 0])
    rows = _make_case(rng, gi.size, b)

    expected = _refine_rows(rows, gi, gk, pvals, "bootstrap")

    got = pvals.copy()
    worker = _DeferredGEV("test.gev")
    worker.submit(rows, gi, gk, got, "bootstrap")
    worker.finish()
    np.testing.assert_array_equal(got, expected)
    # refinement actually changed the flagged entries
    assert not np.array_equal(got[gi, gk], pvals[gi, gk])


def test_deferred_multiple_tiles_disjoint_rows():
    rng = np.random.default_rng(1)
    b = 400
    pvals = np.full((12, 1), 9 / b)
    worker = _DeferredGEV("test.gev")
    expected = pvals.copy()
    for start in (0, 4, 8):
        gi = np.arange(start, start + 4)
        gk = np.zeros(4, np.intp)
        rows = _make_case(rng, 4, b)
        expected = _refine_rows(rows, gi, gk, expected, "permutation")
        worker.submit(rows, gi, gk, pvals, "permutation")
    worker.finish()
    np.testing.assert_array_equal(pvals, expected)


def test_deferred_worker_error_propagates():
    worker = _DeferredGEV("test.gev")
    pvals = np.zeros((2, 1))
    rows = np.ones((1, 5))
    # out-of-bounds target row: the worker's fancy-index write must raise
    # in finish(), not vanish on the thread
    worker.submit(rows, np.array([99]), np.array([0]), pvals, "bootstrap")
    with pytest.raises(IndexError):
        worker.finish()
