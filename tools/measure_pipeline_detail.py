"""Decompose pipelined prove_many time on the real chip: per-proof host
dispatch time vs fetch/parse time, with full TimingTree detail on one warm
prove. Usage: python tools/measure_pipeline_detail.py [K] [window]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_throughput import load_middle  # noqa: E402


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from plonky2_tpu.util import TimingTree

    data, pw = load_middle()

    t0 = time.time()
    data.prove(pw)
    print(f"first prove: {time.time()-t0:.1f}s", flush=True)
    # warm single prove with FULL tree detail
    for _ in range(2):
        tt = TimingTree("warm prove")
        t0 = time.time()
        data.prove(pw, timing=tt)
        dt = time.time() - t0
    print(f"warm prove: {dt:.3f}s; full timing tree:", flush=True)
    tt.print(min_seconds=0.001)

    # pipelined with per-proof dispatch/finish scopes
    for w in (window,):
        tt = TimingTree("prove_many")
        t0 = time.time()
        proofs = data.prove_many([pw] * K, window=w, timing=tt)
        dt = time.time() - t0
        print(f"\nprove_many K={K} window={w}: {dt:.3f}s = "
              f"{K/dt:.2f} proofs/s; scopes:", flush=True)
        tt.print(min_seconds=0.001)
    data.verify(proofs[0])


if __name__ == "__main__":
    main()
