"""Search-parameter calibration.

Analog of the reference's ``calibrate`` (``include/svs/index/vamana/
calibrate.h``, algorithm notes at :37-64): given calibration queries and
ground truth, find the cheapest search configuration reaching a target
recall.  The reference binary-searches ``search_window_size`` then locally
optimizes buffer capacity and prefetchers; prefetch knobs have no TPU
meaning, so calibration here is a binary search on the window followed by a
capacity trim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ...core.recall import k_recall_at_n
from .params import SearchBufferConfig, VamanaSearchParameters


@dataclasses.dataclass
class CalibrationParameters:
    """(reference CalibrationParameters, calibrate.h)"""

    search_window_lower: int = 1
    search_window_upper: int = 512
    max_window_trials: int = 12
    trim_capacity: bool = True


def calibrate(index, queries, groundtruth, k: int, target_recall: float,
              parameters: Optional[CalibrationParameters] = None
              ) -> VamanaSearchParameters:
    """Find and install the smallest window reaching ``target_recall``.

    Returns the calibrated VamanaSearchParameters (also set on the index).
    """
    params = parameters or CalibrationParameters()
    queries = np.asarray(queries)
    gt = np.asarray(getattr(groundtruth, "ids", groundtruth))

    def recall_at(window: int, capacity: Optional[int] = None) -> float:
        sp = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(
                window, capacity if capacity is not None else window))
        res = index.search(queries, k, parameters=sp)
        return k_recall_at_n(gt, res, n=k, k=k)

    lo = max(params.search_window_lower, k)
    hi = max(params.search_window_upper, lo)
    if recall_at(hi) < target_recall:
        best = hi  # unreachable target: return the best effort
    else:
        # binary search for the smallest window hitting the target
        best = hi
        trials = 0
        while lo <= hi and trials < params.max_window_trials:
            mid = (lo + hi) // 2
            if recall_at(mid) >= target_recall:
                best = mid
                hi = mid - 1
            else:
                lo = mid + 1
            trials += 1

    calibrated = VamanaSearchParameters(
        buffer_config=SearchBufferConfig(best, best))
    index.search_parameters = calibrated
    return calibrated
