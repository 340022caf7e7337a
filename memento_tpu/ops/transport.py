"""Compact host->device transport dtype selection (shared helper).

Dense cell blocks of UMI counts ship as the smallest integer dtype that
represents every value EXACTLY; the device casts back to the compute
dtype, so results are bit-identical to shipping float while moving 2-8x
fewer bytes (the dominant cost of the dense-block paths on slow links,
and still 2-4x the PCIe time on normal hosts).

Used by ``ops.corr``, ``parallel.sharded`` and ``parallel.streaming``
(one definition — the selection rules live here only).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sparse

# float32 represents integers exactly only up to 2**24; above that compact
# transport would round and the "cast back is exact" contract breaks
_F32_EXACT_MAX = float(1 << 24)


def compact_transport_dtype(X) -> Optional[np.dtype]:
    """Smallest exact transport dtype for ``X``'s dense blocks, or None.

    Returns int8/int16/float32 when every value is a non-negative integer
    small enough for the dtype to hold exactly; None when compact
    transport is unsafe (negative values, non-integral values, values
    above 2^24, or dense input — probing a dense matrix would materialize
    full-size temporaries, defeating the memory-bounded streaming this
    helper serves; dense callers ship their native dtype).
    """
    if not sparse.issparse(X):
        return None
    vals = X.data
    if vals.size == 0:
        return np.dtype(np.int8)
    vmin = float(vals.min())
    vmax = float(vals.max())
    if vmin < 0 or vmax > _F32_EXACT_MAX:
        return None
    if not bool(np.all(np.mod(vals, 1) == 0)):
        return None
    if vmax <= 127:
        return np.dtype(np.int8)
    if vmax <= 32767:
        return np.dtype(np.int16)
    return np.dtype(np.float32)


__all__ = ["compact_transport_dtype"]
