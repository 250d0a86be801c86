"""Driver benchmark. Prints one JSON line PER METRIC as each completes,
then the headline JSON line last:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}

Headline metric: bench_recursion steady-state proofs/s — warm in-process
re-proves of the middle recursion layer over an inner 2^SIZE-gate proof
(reference plonky2/examples/bench_recursion.rs:294-349 and the README's
canonical `--size 14` protocol), min over `REPEATS` runs. The NTT metric
(coset iNTT+LDE throughput at n=2^20, the other driver metric) is printed
on its own line BEFORE the recursion chain runs, so a prove failure can
never zero the round's NTT evidence; every stage is exception-guarded and
the headline line is always emitted with whatever succeeded.

Budget-proofing (round-4): three rounds of driver runs never captured the
proofs/s headline (r01 partial, r02 rc=1, r03 rc=124 timeout), so the
bench is now wall-clock aware:
  * a PROVISIONAL proofs/s line is emitted immediately after the FIRST
    successful warm re-prove (and after each improvement), BEFORE the
    outer recursion layer builds — the last JSON line on stdout is always
    the best information available at kill time;
  * a watchdog thread emits the final headline with whatever has been
    measured and exits 0 at BENCH_BUDGET_S (default 1500 s) minus 45 s,
    so a driver timeout can no longer produce an empty round;
  * the warm-repeat loop itself stops early if fewer than 60 s remain.

Methodology: every timing is repeat-and-take-min (no RTT subtraction). The
NTT pipeline runs `NTT_ITERS` iterations inside one jit (lax.fori_loop,
input perturbed per iteration to defeat CSE) so the single device->host
fetch (~28ms over the axon tunnel) is amortized, then the whole jitted call
is timed `NTT_CALLS` times and the minimum taken.

vs_baseline: the reference publishes no absolute numbers and no Rust
toolchain exists in this image (BASELINE.md), so vs_baseline for the NTT
reports the fused-Pallas path against the pure-XLA path of the same
pipeline measured in the same process; for proofs/s it is 0.0 (no reference
measurement exists to compare against — recorded honestly rather than
fabricated). See ROOFLINE.md for the clearly-labelled *estimated*
reference-CPU comparison.
"""

import json
import os
import threading
import time
import traceback

import numpy as np

NTT_ITERS = 16
NTT_CALLS = 4
REPEATS = 12
SIZE = 14  # log2 inner gate count — the reference README's bench_recursion size
BATCH_K = 16  # proofs per prove_many batch for the throughput metric
BATCH_WINDOW = 8

_START = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_STATE = {"warm": None, "extra": {}, "done": False}
_LOCK = threading.Lock()


def _left():
    return _BUDGET - (time.time() - _START)


def _emit(metric, value, unit, vs_baseline=0.0, extra=None):
    print(json.dumps({
        "metric": metric, "value": value, "unit": unit,
        "vs_baseline": vs_baseline, "extra": extra or {},
    }), flush=True)


def _emit_headline(tag=None):
    with _LOCK:
        if _STATE["done"]:
            return
        _STATE["done"] = True
        warm = _STATE["warm"]
        extra = dict(_STATE["extra"])
        if tag:
            extra["emitted_by"] = tag
        extra["elapsed_s"] = round(time.time() - _START, 1)
        _emit(f"bench_recursion steady-state recursive prove (inner 2^{SIZE})",
              round(1.0 / warm, 3) if warm else 0.0, "proofs/s/chip", 0.0,
              extra)


def _watchdog():
    while True:
        left = _left() - 45.0
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    if not _STATE["done"]:
        _STATE["extra"]["watchdog_fired"] = True
        _emit_headline(tag="watchdog")
        os._exit(0)


def _min_time(fn, calls):
    """fn(k) -> result; k perturbs the input per call (the axon runtime
    memoizes repeated executions with identical input buffers — verified
    NOT to bias this metric, held as a guard)."""
    best = float("inf")
    fn(0)  # compile + warmup
    for k in range(1, calls + 1):
        t0 = time.perf_counter()
        fn(k)
        best = min(best, time.perf_counter() - t0)
    return best


def ntt_metrics():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from plonky2_tpu.field import ntt
    from plonky2_tpu.ops import pallas_ntt

    lg_n = 20
    n = 1 << lg_n
    num_polys = 4
    rate_bits = 3

    rng = np.random.default_rng(0)
    values = jnp.asarray(
        rng.integers(0, (1 << 64) - (1 << 32), size=(num_polys, n), dtype=np.uint64)
    )

    def make(flag):
        pallas_ntt._FLAG = flag

        @jax.jit
        def pipeline_sum(v):
            def body(i, acc):
                out = ntt.coset_lde(ntt.ifft(v + i.astype(jnp.uint64)), rate_bits)
                return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))

            return lax.fori_loop(0, NTT_ITERS, body, jnp.uint64(0))

        return pipeline_sum

    flag = pallas_ntt._FLAG
    fn = make(flag)
    import jax.numpy as _jnp

    dt = _min_time(lambda k: int(fn(values + _jnp.uint64(k))),
                   NTT_CALLS) / NTT_ITERS
    elems_per_s = num_polys * n / dt

    def vs_xla_cmp():
        # Best-effort: the XLA-path comparison compile is large and the axon
        # remote-compile relay occasionally drops it. Runs AFTER the headline
        # recursion metric (it burned ~300 s of a cold-cache round-3 budget
        # before the headline ever started).
        vs_xla = 0.0
        if pallas_ntt.should_use(lg_n // 2, 0):
            for attempt in range(2):
                try:
                    fn_xla = make("0")
                    import jax.numpy as _jnp

                    dt_xla = _min_time(
                        lambda k: int(fn_xla(values + _jnp.uint64(k))),
                        2) / NTT_ITERS
                    vs_xla = round(dt_xla / dt, 3)
                    break
                except Exception:
                    continue
            pallas_ntt._FLAG = flag
        return vs_xla

    _STATE["vs_xla_cmp"] = vs_xla_cmp
    return {"ntt_elems_per_s": round(elems_per_s, 1),
            "ntt_lg_n": lg_n, "ntt_vs_xla_path": 0.0}


BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_cache")


def _load_cached_middle():
    """Warm-start artifacts from tools/make_bench_cache.py: the inner
    2^SIZE proof + verifier data and the restored middle CircuitData, with
    the proof/verifier-data target structures reconstructed on a fresh
    builder (deterministic: they are the first allocations recursive_proof
    makes). Returns (data, pt, vdt, inner_proof, inner_vd) or None."""
    pf = os.path.join(BENCH_CACHE, f"inner{SIZE}.proof.bin")
    vf = os.path.join(BENCH_CACHE, f"inner{SIZE}.verifier.bin")
    cf = os.path.join(BENCH_CACHE, f"middle{SIZE}.circuit.bin")
    if not all(os.path.exists(p) for p in (pf, vf, cf)):
        return None
    try:
        from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
        from plonky2_tpu.plonk.circuit_serialization import verifier_data_from_bytes
        from plonky2_tpu.plonk.config import CircuitConfig
        from plonky2_tpu.plonk.prover_serialization import circuit_data_from_bytes
        from plonky2_tpu.plonk.serialization import proof_from_bytes
        from plonky2_tpu.recursion.recursive_verifier import (
            add_virtual_proof_with_pis,
            add_virtual_verifier_data,
        )

        with open(vf, "rb") as f:
            inner_vd, inner_common = verifier_data_from_bytes(f.read())
        with open(pf, "rb") as f:
            inner_proof = proof_from_bytes(f.read(), inner_common)
        with open(cf, "rb") as f:
            data = circuit_data_from_bytes(f.read())
        b = CircuitBuilder(CircuitConfig.standard_recursion_config())
        pt = add_virtual_proof_with_pis(b, inner_common)
        vdt = add_virtual_verifier_data(
            b, inner_common.config.fri_config.cap_height)
        return data, pt, vdt, inner_proof, inner_vd
    except Exception:
        _STATE["extra"]["bench_cache_error"] = traceback.format_exc(limit=3)
        return None


def _on_warm(best, r, cold=False):
    _STATE["warm"] = best
    _STATE["extra"]["warm_recursive_prove_s"] = round(best, 3)
    tag = ("cold, includes compiles" if cold
           else f"provisional, repeat {r}")
    extra = {"warm_recursive_prove_s": round(best, 3)}
    if cold:
        extra["first_prove_includes_compiles"] = True
    _emit(f"bench_recursion steady-state recursive prove (inner 2^{SIZE})"
          f" [{tag}]",
          round(1.0 / best, 3), "proofs/s/chip", 0.0, extra)


def recursion_metrics():
    """Chain per the reference protocol, but ordered so the headline metric
    (warm middle-layer re-prove) is measured and emitted BEFORE the outer
    layer builds: inner -> middle -> warm repeats (provisional emit after
    each improvement) -> outer. When the bench_cache warm-start artifacts
    exist, the cold inner prove + middle build (the ~25 min that starved
    three driver rounds) are skipped entirely."""
    cached = _load_cached_middle()
    if cached is not None:
        from plonky2_tpu.examples.bench_recursion import _phase_dict
        from plonky2_tpu.iop.witness import PartialWitness
        from plonky2_tpu.recursion.recursive_verifier import (
            set_proof_with_pis_target,
            set_verifier_data_target,
        )
        from plonky2_tpu.util import TimingTree

        data, pt, vdt, inner_proof, inner_vd = cached
        pw = PartialWitness()
        set_proof_with_pis_target(pw, pt, inner_proof)
        set_verifier_data_target(pw, vdt, inner_vd)
        _STATE["middle"] = (data, pw)  # reused by batched_metrics
        timings = {"from_cache": True}
        t_start = time.time()
        best = float("inf")
        best_phases = None
        repeat_times = []
        proof = None
        for r in range(REPEATS + 1):  # +1: repeat 0 pays in-process compiles
            if r > 1 and _left() < 60:
                break
            phase_timing = TimingTree("warm prove") if r else None
            t0 = time.time()
            proof = data.prove(pw, timing=phase_timing)
            dt = time.time() - t0
            if r == 0:
                timings["first_prove_s"] = round(dt, 1)
                # provisional even from the compile-laden first prove: a
                # cold-cache round must not report 0.0 proofs/s just because
                # the budget died before the first WARM repeat
                _STATE["extra"]["first_prove_includes_compiles"] = True
                _on_warm(dt, -1, cold=True)
                continue
            _STATE["extra"].pop("first_prove_includes_compiles", None)
            repeat_times.append(dt)
            _STATE["extra"]["warm_repeats_done"] = len(repeat_times)
            if dt < best:
                best = dt
                # phases reported for the BEST repeat, so the breakdown sums
                # to (about) the repeat the headline describes
                best_phases = (_phase_dict(phase_timing)
                               if phase_timing is not None else None)
                _on_warm(best, r - 1)
        data.verify(proof)
        if repeat_times:
            timings["warm_prove"] = best
            srt = sorted(repeat_times)
            _STATE["extra"]["warm_prove_median_s"] = round(
                srt[len(srt) // 2], 3)
            _STATE["extra"]["warm_prove_all_s"] = [
                round(t, 3) for t in repeat_times]
        if best_phases:
            timings["phases"] = best_phases

        timings["chain_total"] = round(time.time() - t_start, 1)
        return timings

    from plonky2_tpu.examples.bench_recursion import run_chain

    t0 = time.time()
    _, timings = run_chain(
        SIZE, verbose=False, repeats=REPEATS, warm_before_outer=True,
        on_warm=_on_warm, time_left=_left)
    timings["chain_total"] = round(time.time() - t0, 1)
    return timings


def batched_metrics():
    """Second headline: batched/pipelined throughput proving — prove_many
    pipelines host witness generation of proof i+1 with the device chain of
    proof i and defers the single fetch per proof (plonk/prover.prove_many;
    reference analog: rayon whole-machine parallelism over independent
    proofs, maybe_rayon/src/lib.rs:31-289). Proofs are byte-identical to
    sequential prove calls (tests/test_prove_many.py)."""
    if _STATE.get("middle") is None:
        return
    data, pw = _STATE["middle"]
    best = float("inf")
    best_cfg = None
    per_cfg = {}
    for threads in (2, 3, 4):
        for _ in range(2):
            if _left() < 30:
                break
            t0 = time.time()
            proofs = data.prove_many([pw] * BATCH_K, window=BATCH_WINDOW,
                                     threads=threads)
            dt = (time.time() - t0) / BATCH_K
            per_cfg[f"threads={threads}"] = min(
                per_cfg.get(f"threads={threads}", float("inf")), dt)
            if dt < best:
                best, best_cfg = dt, threads
    if best == float("inf"):
        return
    data.verify(proofs[0])
    data.verify(proofs[-1])
    _STATE["extra"]["batched_proofs_per_s"] = round(1.0 / best, 3)
    _emit(f"batched throughput recursive prove (prove_many K={BATCH_K}, "
          f"inner 2^{SIZE})",
          round(1.0 / best, 3), "proofs/s/chip", 0.0,
          {"K": BATCH_K, "window": BATCH_WINDOW, "threads": best_cfg,
           "per_proof_s": round(best, 4),
           "per_config_s": {k: round(v, 4) for k, v in per_cfg.items()},
           "byte_identity": "asserted by tests/test_prove_many.py"})


def microbench_metrics():
    """Criterion-analog microbenches (reference plonky2/benches/*.rs) as
    their own JSON metric lines: ffts/LDE, poseidon/keccak hashing, merkle
    build."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benches import common as bcommon
    from benches import ffts, hashing, merkle

    rows = []

    def capture(name, size, seconds, unit="elems/s", elems=None, **extra):
        row = {"bench": name, "size": size, "seconds": round(seconds, 6)}
        if elems is not None:
            row["throughput"] = round(elems / seconds, 1)
            row["unit"] = unit
        rows.append(row)
        return row

    mods = (ffts, hashing, merkle)
    origs = [(bcommon, bcommon.report)] + [(m, m.report) for m in mods]
    # patch each module's own binding (`from benches.common import report`
    # binds by value at import time)
    for m, _ in origs:
        m.report = capture
    # enough in-jit iterations that device compute dominates the ~25 ms
    # tunnel RTT at the small criterion sizes
    for mod, kwargs in ((ffts, {"sizes": (13, 16), "iters": 48}),
                        (hashing, {"iters": 48}), (merkle, {})):
        if _left() < 120:
            break
        try:
            mod.main(**kwargs)
        except Exception:
            _STATE["extra"].setdefault("microbench_errors", []).append(
                traceback.format_exc(limit=2))
    for m, orig in origs:
        m.report = orig
    for row in rows:
        _emit(f"microbench {row['bench']} ({row['size']})",
              row.get("throughput", row["seconds"]),
              row.get("unit", "seconds"), 0.0,
              {"seconds": row["seconds"]})


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    extra = _STATE["extra"]

    # -- metric 1: NTT/LDE throughput (emitted immediately) ------------------
    try:
        extra.update(ntt_metrics())
        _emit(f"coset iNTT+LDE throughput (n=2^{extra['ntt_lg_n']})",
              extra["ntt_elems_per_s"], "elems/s/chip",
              extra["ntt_vs_xla_path"],
              {"iters": NTT_ITERS, "calls": NTT_CALLS})
    except Exception:
        extra["ntt_error"] = traceback.format_exc(limit=3)
        _emit("coset iNTT+LDE throughput (n=2^20)", 0.0, "elems/s/chip", 0.0,
              {"error": "see headline extra"})

    # -- metric 2: recursion-chain proofs/s (provisional lines emitted as
    #    warm repeats land; see recursion_metrics) ---------------------------
    try:
        timings = recursion_metrics()
        warm = timings.get("warm_prove")
        if warm:
            _STATE["warm"] = warm
        extra.update({
            "inner_prove_s": round(timings.get("inner", 0.0), 2),
            "middle_first_s": round(timings.get("middle", 0.0), 2),
            "outer_first_s": round(timings.get("outer", 0.0), 2),
            "warm_recursive_prove_s": round(warm, 3) if warm else None,
            "repeats": REPEATS,
            "inner_size_log2": SIZE,
            "chain_total_s": timings.get("chain_total"),
        })
        if timings.get("phases"):
            extra["warm_prove_phases_s"] = timings["phases"]
    except Exception:
        extra["recursion_error"] = traceback.format_exc(limit=3)

    # -- metric 3: batched/pipelined throughput (second headline) ------------
    try:
        if _left() > 60:
            batched_metrics()
    except Exception:
        extra["batched_error"] = traceback.format_exc(limit=3)

    # -- metric 4: device-count scaling (only when real multi-chip exists) ---
    try:
        import jax

        n = len(jax.devices())
        if n > 1 and _left() > 300:
            import sys
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from scaling_sweep import sweep

            sizes = sorted({s for s in (1, 2, 4, 8, 16, 32) if s <= n} | {n})
            sc = sweep(sizes, warm_repeats=2)
            per = {r["devices"]: r["proofs_per_s"] for r in sc["results"]}
            eff = sc["results"][-1]["efficiency_vs_1"] if sc["results"] else 0.0
            extra["scaling"] = sc["results"]
            best_n = max(per) if per else 0
            _emit(f"sharded prove scaling (1..{n} chips, inner 2^12)",
                  per.get(best_n, 0.0), "proofs/s", eff, {"per_devices": per})
    except Exception:
        extra["scaling_error"] = traceback.format_exc(limit=3)

    # -- metric 5: criterion-analog microbenches (reference benches/*.rs) ----
    try:
        if _left() > 180:
            microbench_metrics()
    except Exception:
        extra["microbench_error"] = traceback.format_exc(limit=3)

    # -- deferred: NTT fused-vs-XLA-path ratio (informational only; runs
    #    after the headline work so it can never starve it) -----------------
    try:
        cmp_fn = _STATE.get("vs_xla_cmp")
        if cmp_fn is not None and _left() > 180:
            vs = cmp_fn()
            if vs:
                extra["ntt_vs_xla_path"] = vs
                _emit(f"coset iNTT+LDE throughput (n=2^{extra['ntt_lg_n']}) "
                      "[vs-XLA ratio update]",
                      extra["ntt_elems_per_s"], "elems/s/chip", vs,
                      {"note": "same value as the first NTT line; "
                               "vs_baseline now measured"})
    except Exception:
        extra["vs_xla_error"] = traceback.format_exc(limit=2)

    # -- headline line (always printed, last) --------------------------------
    _emit_headline()


if __name__ == "__main__":
    main()
