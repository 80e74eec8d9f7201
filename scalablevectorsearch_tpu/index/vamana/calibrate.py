"""Search-parameter calibration.

Analog of the reference's ``calibrate`` (``include/svs/index/vamana/
calibrate.h``, algorithm notes at :37-64): given calibration queries and
ground truth, find the cheapest search configuration reaching a target
recall.  The reference binary-searches ``search_window_size``, then optimizes
the split buffer (window vs total capacity) and prefetchers by measured QPS;
prefetch knobs have no TPU meaning, so calibration here is the window binary
search followed by a window/capacity split optimization: a smaller pop
horizon with a larger retention capacity often reaches the same recall with
fewer expansions (calibrate.h's ``SearchBufferOptimization::All`` axis).
"""

from __future__ import annotations

import dataclasses
import time
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
    # optimize the window/capacity split by measured QPS after the window
    # search (reference optimizes buffer capacity as a separate axis)
    trim_capacity: bool = True
    timing_reps: int = 2


def calibrate(index, queries, groundtruth, k: int, target_recall: float,
              parameters: Optional[CalibrationParameters] = None
              ) -> VamanaSearchParameters:
    """Find the cheapest search parameters reaching ``target_recall``.

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

    def qps_at(window: int, capacity: int) -> float:
        sp = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(window, capacity))
        index.search(queries, k, parameters=sp)  # warm the compile cache
        t0 = time.perf_counter()
        for _ in range(params.timing_reps):
            index.search(queries, k, parameters=sp)
        dt = time.perf_counter() - t0
        return len(queries) * params.timing_reps / max(dt, 1e-9)

    lo = max(params.search_window_lower, k)
    hi = max(params.search_window_upper, lo)
    if recall_at(hi) < target_recall:
        best = hi  # unreachable target: return the best effort
        calibrated = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(best, best))
        index.search_parameters = calibrated
        return calibrated

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

    best_cfg = (best, best)
    if params.trim_capacity and best > k:
        # window/capacity split: smaller pop horizon, larger retention.
        # Feasibility per window = smallest capacity (among a doubling probe)
        # that still reaches the target; winner = measured QPS.
        best_qps = qps_at(*best_cfg)
        for window in {max(k, best // 2), max(k, (3 * best) // 4)}:
            if window >= best:
                continue
            for capacity in (best, 2 * best):
                if capacity < window:
                    continue
                if recall_at(window, capacity) >= target_recall:
                    q = qps_at(window, capacity)
                    if q > best_qps:
                        best_qps, best_cfg = q, (window, capacity)
                    break  # smallest feasible capacity for this window

    calibrated = VamanaSearchParameters(
        buffer_config=SearchBufferConfig(*best_cfg))
    index.search_parameters = calibrated
    return calibrated
