"""Fused single-executable pipeline vs a chain of per-phase executables.

profile_phases.py shows sum-of-phase marginal costs ~0.9 ms BELOW the fused
full program, and exp_barriers.py shows in-jit optimization barriers do NOT
close the gap -- so the difference is not cross-phase fusion but something
about executing one large program vs several smaller dispatches.  Measure a
real 6-dispatch chain (phase outputs stay on device, all dispatches async,
one fence at the end) under the same marginal-cost methodology.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from profile_phases import (  # noqa: E402
    cfg, img, marginal_ms, p_norm, p_reduce, p_analysis, p_apply, p_expand,
    p_grad, f_full)


def chain(x):
    nrm = p_norm(x)
    bandpass, downs = p_reduce(nrm)
    sdevs, max_bins = p_analysis(bandpass)
    cnr, ebs, nr = p_apply(bandpass, sdevs, max_bins)
    recon = p_expand(downs, ebs, nr)
    return p_grad(recon, nrm, cnr)


def marginal_chain(k=24, reps=6):
    s = jax.jit(lambda o: jnp.sum(o.astype(jnp.uint32)))
    np.asarray(s(chain(img)))  # warm all phase executables

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = s(chain(img))
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    print("device:", jax.devices()[0])
    full1 = marginal_ms(f_full, (img,))
    print(f"{'fused single program':28s} {full1:7.3f} ms")
    ch = marginal_chain()
    print(f"{'6-dispatch phase chain':28s} {ch:7.3f} ms")
    # interleave a second round to bound drift within the process
    full2 = marginal_ms(f_full, (img,))
    print(f"{'fused single program (re)':28s} {full2:7.3f} ms")
    ch2 = marginal_chain()
    print(f"{'6-dispatch phase chain (re)':28s} {ch2:7.3f} ms")


if __name__ == "__main__":
    main()
