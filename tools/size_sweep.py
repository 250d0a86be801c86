"""Inner-size sweep of the bench_recursion chain on the real chip
(reference supports arbitrary --size, examples/bench_recursion.rs:319-325).

Runs the chain at each requested inner size, records first-build and warm
re-prove times plus the per-phase breakdown of the last warm prove, and
writes SIZES.json / SIZES.md at the repo root. The driver-facing headline
stays bench.py's SIZE=14 protocol; this artifact demonstrates capability
at scale (VERDICT round-3 item 7: inner 2^16).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/size_sweep.py --sizes 14 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[14, 16])
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO, "SIZES"))
    args = p.parse_args()

    import jax

    from plonky2_tpu.examples.bench_recursion import run_chain

    results = []
    for size in args.sizes:
        print(f"== inner 2^{size} ==", flush=True)
        t0 = time.time()
        outer, timings = run_chain(size, verbose=True, repeats=args.repeats,
                                   warm_before_outer=True)
        row = {
            "inner_size_log2": size,
            "inner_prove_s": round(timings.get("inner", 0.0), 2),
            "middle_first_s": round(timings.get("middle", 0.0), 2),
            "outer_first_s": round(timings.get("outer", 0.0), 2),
            "warm_prove_s": round(timings.get("warm_prove", 0.0), 3),
            "proofs_per_s": round(1.0 / timings["warm_prove"], 3)
            if timings.get("warm_prove") else None,
            "phases_s": timings.get("phases"),
            "outer_degree_bits": outer[2].degree_bits,
            "total_s": round(time.time() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    payload = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]),
               "repeats": args.repeats,
               "results": results}
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=1)
    lines = ["# Inner-size sweep (bench_recursion chain, real chip)", "",
             "| inner | inner prove | middle first | warm re-prove | proofs/s |",
             "|---|---|---|---|---|"]
    for r in results:
        lines.append(f"| 2^{r['inner_size_log2']} | {r['inner_prove_s']}s "
                     f"| {r['middle_first_s']}s | {r['warm_prove_s']}s "
                     f"| {r['proofs_per_s']} |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out + ".json")


if __name__ == "__main__":
    main()
