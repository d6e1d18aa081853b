"""Benchmark harness — run on the real TPU chip by the round driver.

Measures the BASELINE.json driver metric: negacyclic NTT limb-transforms
per second per chip at N=2^14, plus key-switch throughput (full
square→relinearize→rescale steps) on the encrypted-MNIST-shaped tower
(N=2^13, 7 limbs — infer.jl:97-110 re-planned to <2^31 limbs).

Methodology note: on this tunneled-TPU environment ``block_until_ready``
returns before execution completes, so naive timers read ~0. All
measurements here chain K data-dependent ops inside ONE jitted program
and force a device→host transfer; per-op cost is the slope between a
long and a short chain (transfer and dispatch overheads cancel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no performance numbers (README.md:73-79), so
vs_baseline is the ratio against the first recorded honest value of this
bench (BENCH_BASELINE.json, written on first run).
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LASTGOOD = os.path.join(_HERE, "BENCH_LASTGOOD.json")


def _watchdog_smoke(timeout_s=240.0):
    """Probe the backend with a trivial jitted op under a hard timeout.

    The tunneled-TPU execute path can wedge (jax.devices() works but
    execution hangs forever). Run the probe in a daemon thread; if it
    does not finish in ``timeout_s``, report the backend unavailable
    instead of letting the driver's timeout kill us with no output.
    Returns the backend name, or None if the chip is stuck.

    A healthy but cold tunnel needs ~90s for the FIRST trivial jitted op
    (measured 2026-08-18), so the limit must sit well above that; the
    probe doubles as connection warm-up for the real measurements.
    """
    result = {}

    def probe():
        import jax
        import jax.numpy as jnp
        y = np.asarray(jax.jit(lambda a: a * 2 + 1)(jnp.arange(8)))
        assert int(y[3]) == 7
        result["backend"] = jax.default_backend()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return result.get("backend") if not th.is_alive() else None


def _slope_time(build_chain, args, k_small=2, k_big=18, reps=9,
                max_tries=3, trials=3, sol_time=None, pass_gap_s=1.5):
    """Min-estimator chained-jit slope, with a same-session spread.

    Tunnel noise is strictly additive (queueing, link stalls, tenant
    contention), so the minimum over interleaved reps estimates true
    execution time; the slope between the min times of a long and a
    short chain removes dispatch/transfer constants. A noisy run can
    still produce a non-positive slope; retry with a longer chain
    instead of reporting a floor value that reads as absurd throughput.

    Round-5 hardening (VERDICT r4 item 6): the reps run as TWO spaced
    passes so a single transient tunnel stall cannot cover every
    measurement, and subgroup slopes that are non-positive or below the
    physical speed-of-light floor (``sol_time``, seconds per chain unit
    from the docs/performance.md MFU model) are discarded from the
    spread instead of inverting into absurd throughput bounds (the
    r04 209,823/s artifact). If every subgroup is unphysical the spread
    collapses to the headline.

    Returns ``(slope, (lo, hi))``: the headline slope uses the min over
    ALL reps (the best estimator under additive noise); (lo, hi) are the
    min/max of the surviving per-group slopes computed from interleaved
    rep subsets — a zero-extra-cost measure of how much the tunnel moved
    within this session (round-3 VERDICT item 5: the absolute number is
    only evidence with its spread attached)."""
    for attempt in range(max_tries):
        f_small, f_big = build_chain(k_small), build_chain(k_big)
        np.asarray(f_small(*args))
        np.asarray(f_big(*args))
        ts, tb = [], []
        for p in range(2):                       # two spaced passes
            if p:
                time.sleep(pass_gap_s)
            for r in range(reps):
                pair = (((f_small, ts), (f_big, tb)) if r % 2 == 0
                        else ((f_big, tb), (f_small, ts)))
                for f, acc in pair:
                    t0 = time.perf_counter()
                    np.asarray(f(*args))
                    acc.append(time.perf_counter() - t0)
        dk = k_big - k_small
        slope = (min(tb) - min(ts)) / dk
        if slope > 0:
            g = max(1, min(trials, reps))
            sub = [(min(tb[i::g]) - min(ts[i::g])) / dk for i in range(g)]
            floor = sol_time if sol_time else 0.0
            sub = [s for s in sub if s > floor]   # physical sanity filter
            if not sub:
                sub = [slope]
            return slope, (min(sub), max(sub))
        k_big = k_small + 2 * (k_big - k_small)
    return float("nan"), (float("nan"), float("nan"))


def _per_s_spread(work, tspread):
    """Convert a (lo, hi) slope-time spread into a throughput spread
    (order flips: the slowest time is the lowest rate). Non-positive or
    non-finite slope bounds yield NaN (serialized as null) rather than
    negative throughput (ADVICE r4)."""
    lo_t, hi_t = tspread
    if not (np.isfinite(lo_t) and np.isfinite(hi_t)
            and lo_t > 0 and hi_t > 0):
        return [float("nan"), float("nan")]
    return sorted([work / hi_t, work / lo_t])


def _bench_ntt(batch=16, L=8, n=1 << 14):
    import jax
    import jax.numpy as jnp

    import toyfhe_tpu as F
    from toyfhe_tpu.ops import ntt as nttmod

    ring = F.make_rns_ring(n, tuple([28] * L))
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2 ** 27, (batch, L, n)).astype(np.uint32))

    def chain(K):
        @jax.jit
        def f(a):
            for _ in range(K):
                a = nttmod.ntt(ring.tables, a)
            return a
        return f

    # speed-of-light floor: 2.94M limb-NTT/s/chip (docs/performance.md)
    t, sp = _slope_time(chain, (x,), sol_time=batch * L / 2.94e6)
    return batch * L / t, t, _per_s_spread(batch * L, sp)


def _bench_keyswitch(batch=4, L=7, n=1 << 13):
    """Throughput of the fused square→relin→rescale step.

    Operands are synthetic residues: modular-arithmetic cost is
    value-independent, and generating real keys eagerly on the tunneled
    TPU costs minutes (correctness of this exact step vs the sequential
    engine is covered by tests/test_parallel.py)."""
    import jax

    import toyfhe_tpu as F
    from toyfhe_tpu.parallel import ops as pops

    ring = F.make_rns_ring(n, tuple([28] * L))
    rng = np.random.default_rng(1)
    lim = min(ring.primes)
    masks = rng.integers(0, lim, (L, L, n)).astype(np.uint32)
    maskeds = rng.integers(0, lim, (L, L, n)).astype(np.uint32)
    cts = np.random.default_rng(2).integers(
        0, lim, (batch, 2, L, n)).astype(np.uint32)
    import jax.numpy as jnp
    cts = jnp.asarray(cts)

    def chain(K):
        import jax.numpy as jnp
        from toyfhe_tpu.ops.ntt import _mxu_tables
        tabs = pops.full_table_pytree(ring.tables)
        mt = _mxu_tables(ring.tables)
        qk = ring.primes[-1]
        rescale_inv = np.array(
            [[pow(qk, -1, p) * (1 << 32) % p if p != qk else 0]
             for p in ring.primes], dtype=np.uint64).astype(np.uint32)
        km, kd = jnp.asarray(masks), jnp.asarray(maskeds)

        @jax.jit
        def f(c):
            for _ in range(K):
                out = pops._square_relin_rescale_local(
                    c, km, kd, jnp.asarray(rescale_inv), tabs, mt=mt)
                # re-embed to keep a data-dependent fixed-shape chain
                c = c.at[:, :, : L - 1, :].set(out[:, :, : L - 1, :])
            return c
        return f

    # speed-of-light floor: 82k transform-bound steps/s (docs/performance.md)
    t, sp = _slope_time(chain, (cts,), k_small=1, k_big=7,
                        sol_time=batch / 82e3)
    return batch / t, t, _per_s_spread(batch, sp)


def _make_hybrid_fixture(batch=4, L=7, n=1 << 13, dnum=4, k=3):
    """Shared synthetic HybridRaised fixture for the keyswitch benches."""
    import jax.numpy as jnp

    import toyfhe_tpu as F
    from toyfhe_tpu.core.ring import RingElt
    from toyfhe_tpu.core.rlwe import KeyComponent, KeySwitchKey

    ring = F.make_rns_ring(n, tuple([28] * L + [29] * k))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum, k)
    rng = np.random.default_rng(1)
    lim = min(ring.primes)
    key_ring = params.ring_key
    comps = [KeyComponent(
        mask=RingElt(dual=jnp.asarray(rng.integers(
            0, lim, (key_ring.nlimbs, n)).astype(np.uint32))),
        masked=RingElt(dual=jnp.asarray(rng.integers(
            0, lim, (key_ring.nlimbs, n)).astype(np.uint32))))
        for _ in range(params.dnum)]

    class _EK:                     # shape the builder expects (ek.key.key)
        pass
    ek = _EK()
    ek.key = KeySwitchKey(params, comps, key_ring)
    cts = jnp.asarray(np.random.default_rng(2).integers(
        0, lim, (batch, 2, L, n)).astype(np.uint32))
    return params, ek, cts


def _bench_keyswitch_fused(batch=4, L=7, n=1 << 13, dnum=4, k=3):
    """Throughput of the FUSED-schedule square→relin→rescale step
    (make_hybrid_fused_step: in-group digit reuse + dual-domain ModDown
    + folded final rescale — 95 → 61 limb transforms per step).
    Bit-identical to the engine (tests/test_parallel.py)."""
    import jax

    from toyfhe_tpu.parallel import ops as pops

    params, ek, cts = _make_hybrid_fixture(batch, L, n, dnum, k)
    step, place = pops.make_hybrid_fused_step(params, ek)

    def chain(K):
        @jax.jit
        def f(c):
            for _ in range(K):
                out = step(c)
                c = c.at[:, :, : L - 1, :].set(out[:, :, : L - 1, :])
            return c
        return f

    # speed-of-light floor: 82k transform-bound steps/s (docs/performance.md)
    t, sp = _slope_time(chain, (cts,), k_small=1, k_big=7,
                        sol_time=batch / 82e3)
    return batch / t, t, _per_s_spread(batch, sp)


def _bench_keyswitch_hybrid(batch=4, L=7, n=1 << 13, dnum=4, k=3):
    """Throughput of the square→relin→rescale step on the dnum-grouped
    hybrid gadget (core/hybrid.py): dnum digit NTT batches over L+k
    limbs instead of L batches over L+1 — the production key-switch.
    Raising primes are 29-bit requests so the whole expanded tower stays
    under the 2^30 MXU/lazy gate (a 30-bit request yields 31-bit primes
    and silently demotes the transforms to radix-2). Synthetic keys
    (see _bench_keyswitch); correctness vs the eager engine is covered
    by tests/test_parallel.py."""
    import jax

    from toyfhe_tpu.parallel import ops as pops

    params, ek, cts = _make_hybrid_fixture(batch, L, n, dnum, k)
    step, place = pops.make_hybrid_sharded_step(None, params, ek)

    def chain(K):
        @jax.jit
        def f(c):
            for _ in range(K):
                out = step(c)
                c = c.at[:, :, : L - 1, :].set(out[:, :, : L - 1, :])
            return c
        return f

    # speed-of-light floor: 82k transform-bound steps/s (docs/performance.md)
    t, sp = _slope_time(chain, (cts,), k_small=1, k_big=7,
                        sol_time=batch / 82e3)
    return batch / t, t, _per_s_spread(batch, sp)


def child_main():
    """One full measurement attempt in THIS process. Prints the JSON line
    on success; exits nonzero (or hangs, to be killed by the parent) on a
    wedged backend."""
    if os.environ.get("BENCH_SIMULATE_WEDGE"):
        time.sleep(10 ** 6)          # kill-test hook for the parent loop
    # persistent XLA compile cache (round-4 VERDICT item 7): a second
    # bench session reuses this session's compiled executables instead
    # of paying minutes of tunnel compile again
    try:
        sys.path.insert(0, _HERE)
        from toyfhe_tpu.utils.cache import enable_compile_cache
        enable_compile_cache()
    except Exception:
        pass
    backend = _watchdog_smoke()
    if backend is None:
        os._exit(3)
    ntt_per_s, ntt_t, ntt_sp = _bench_ntt()
    ks_per_s, ks_t, ks_sp = _bench_keyswitch()
    nansp = [float("nan")] * 2
    try:
        hks_per_s, hks_t, hks_sp = _bench_keyswitch_hybrid()
    except Exception:
        hks_per_s, hks_t, hks_sp = float("nan"), float("nan"), nansp
    try:
        fks_per_s, fks_t, fks_sp = _bench_keyswitch_fused()
    except Exception:
        fks_per_s, fks_t, fks_sp = float("nan"), float("nan"), nansp
    # round-4 gadget default: dnum=2, α=4, k=4 — 46-transform fused
    # census (vs 61) and dnum·T = 22 key-contraction rows (vs 40) at
    # equal noise; wall-clock effect is inside tunnel noise
    # (docs/performance.md round-4 A/B replication) — the claims are
    # op-count and key-size, not a measured speedup
    try:
        d2_per_s, d2_t, d2_sp = _bench_keyswitch_fused(dnum=2, k=4)
    except Exception:
        d2_per_s, d2_t, d2_sp = float("nan"), float("nan"), nansp

    base_path = os.path.join(_HERE, "BENCH_BASELINE.json")
    record = {"ntt_per_s": ntt_per_s, "keyswitch_per_s": ks_per_s,
              "backend": backend, "methodology": "chained-jit slope v2"}
    vs = 1.0
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        if base.get("methodology") == record["methodology"] and base.get("ntt_per_s"):
            vs = ntt_per_s / base["ntt_per_s"]
        else:
            json.dump(record, open(base_path, "w"))
    else:
        json.dump(record, open(base_path, "w"))

    def _num(x, nd):
        return round(x, nd) if np.isfinite(x) else None

    out = {
        "metric": "ntt_transforms_per_s_chip_n2^14",
        "value": _num(ntt_per_s, 1),
        "unit": "limb-NTT/s",
        "vs_baseline": _num(vs, 3),
        "spread": {
            "ntt_per_s": [_num(v, 1) for v in ntt_sp],
            "keyswitch_per_s": [_num(v, 2) for v in ks_sp],
            "hybrid_keyswitch_per_s": [_num(v, 2) for v in hks_sp],
            "fused_keyswitch_per_s": [_num(v, 2) for v in fks_sp],
            "fused_keyswitch_dnum2_per_s": [_num(v, 2) for v in d2_sp],
            "method": "min/max of interleaved same-session rep-group "
                      "slopes over two spaced passes, non-positive and "
                      "faster-than-speed-of-light subgroups discarded; "
                      "session-to-session tunnel variance is larger "
                      "(docs/performance.md)"},
        "keyswitch_per_s": _num(ks_per_s, 2),
        "hybrid_keyswitch_per_s": _num(hks_per_s, 2),
        "fused_keyswitch_per_s": _num(fks_per_s, 2),
        "fused_keyswitch_dnum2_per_s": _num(d2_per_s, 2),
        "ntt_batch_ms": _num(ntt_t * 1e3, 3),
        "keyswitch_step_ms": _num(ks_t * 1e3, 3),
        "hybrid_keyswitch_step_ms": _num(hks_t * 1e3, 3),
        "fused_keyswitch_step_ms": _num(fks_t * 1e3, 3),
        "fused_keyswitch_dnum2_step_ms": _num(d2_t * 1e3, 3),
        "backend": backend,
    }
    print(json.dumps(out), flush=True)


def main(attempts=3, attempt_timeout_s=420.0):
    """Un-losable orchestrator (round-2 VERDICT item 1).

    The tunneled-TPU client can wedge irrecoverably inside one process
    (jax.devices() works, execution hangs), so each measurement attempt
    runs in a FRESH subprocess under a hard timeout; between attempts the
    child is killed by exact pgid and a new client is initialized from
    scratch. Every good measurement is cached in BENCH_LASTGOOD.json; if
    all attempts wedge, the last good result is emitted explicitly
    labeled ``"stale": true`` instead of a value-0 round.
    """
    import signal

    def _emit_stale_and_die(signum, frame):
        # Driver is killing us mid-retry: still get an honest line out.
        if os.path.exists(_LASTGOOD):
            rec = json.load(open(_LASTGOOD))
            rec["stale"] = True
            rec["note"] = "driver signal during retries; last good shown"
            print(json.dumps(rec), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _emit_stale_and_die)
    signal.signal(signal.SIGINT, _emit_stale_and_die)

    notes = []
    for attempt in range(attempts):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            start_new_session=True, cwd=_HERE)
        try:
            # First attempt gets the full budget (cold tunnel ~90s before
            # the first op); retries get less so three wedges stay inside
            # a plausible driver timeout.
            t_limit = (attempt_timeout_s if attempt == 0
                       else min(attempt_timeout_s, 300.0))
            out, _ = p.communicate(timeout=t_limit)
        except subprocess.TimeoutExpired:
            # kill the exact process group we started (never by pattern)
            try:
                os.killpg(os.getpgid(p.pid), 9)
            except (ProcessLookupError, PermissionError):
                p.kill()
            p.wait()
            notes.append(f"attempt {attempt + 1}: timed out after "
                         f"{t_limit:.0f}s, child killed")
            continue
        line = next((l for l in reversed(out.strip().splitlines())
                     if l.startswith("{")), None)
        if p.returncode == 0 and line:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                notes.append(f"attempt {attempt + 1}: unparseable output")
                continue
            if rec.get("value"):
                rec["stale"] = False
                with open(_LASTGOOD, "w") as f:
                    json.dump(rec, f)
                print(json.dumps(rec), flush=True)
                return
            notes.append(f"attempt {attempt + 1}: zero value")
        else:
            notes.append(f"attempt {attempt + 1}: rc={p.returncode} "
                         "(watchdog tripped or crash)")
    # All attempts wedged — emit the last good measurement, honestly stale.
    if os.path.exists(_LASTGOOD):
        rec = json.load(open(_LASTGOOD))
        rec["stale"] = True
        rec["note"] = ("device wedged this run; last good in-session "
                       "measurement shown. " + "; ".join(notes))
        print(json.dumps(rec), flush=True)
        return
    print(json.dumps({
        "metric": "ntt_transforms_per_s_chip_n2^14", "value": 0,
        "unit": "limb-NTT/s", "vs_baseline": 0.0, "backend": "unavailable",
        "stale": False, "note": "; ".join(notes)}), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
        os._exit(0)
    main(attempts=int(os.environ.get("BENCH_ATTEMPTS", "3")),
         attempt_timeout_s=float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "420")))
