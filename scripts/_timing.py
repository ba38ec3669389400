"""Shared marginal-cost timer for the on-chip A/B scripts.

Same methodology as bench.py's measure(): time K chained dispatches vs 1
(best of ``reps``) and divide the difference by K-1, removing the ~30 ms
fixed axon-relay round trip.  A host transfer (np.asarray) is the only
reliable fence under the relay.

Includes bench.py's sanity guard: with the relay's documented +/-10-15%
per-session swings, a slow window hitting only the 1-rep leg can make
``tk - t1`` non-positive (or absurdly small); such a sample falls back to
the single-dispatch time instead of recording a nonsensical near-zero
marginal.
"""

import time

import numpy as np


def marginal_ms(fn, args, k=25, reps=6):
    np.asarray(fn(*args))  # warm + fence

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    per_iter = (tk - t1) / (k - 1)
    if per_iter <= 0 or per_iter > t1:
        per_iter = t1
    return per_iter * 1e3
