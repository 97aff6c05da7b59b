#!/usr/bin/env python3
"""Tests for dev/bench_diff.py --gate (run: python3 dev/test_bench_diff.py).

Covers the round-16 expected-refusals contract in BOTH directions:
  - a DECLARED refusal (q_dedup_embedding, matching message) erring in
    both records passes the gate;
  - an UNDECLARED query erring in both records FAILS (pre-r16 any
    both-sides error passed silently, so the gate only worked by
    accident of both records erring);
  - a declared refusal whose message drifted FAILS;
  - a newly-erring query still FAILS; a plain regression still FAILS;
  - a corrupt record (staged charge >= query seconds) is warned about.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DIFF = os.path.join(HERE, "bench_diff.py")

REFUSAL = ("requirement failed: exact all-pairs embedding tier is O(N2): "
           "n=200000 rows would score ~19999900000 pairs (cap 10000 rows).")


def record(queries, staged=None, **extra):
    d = {"metric": "total",
         "value": sum(v for v in queries.values() if isinstance(v, (int, float))),
         "unit": "sec", "probe": "toRdd", "sf": "/tmp/sfbig100",
         "queries": queries}
    if staged:
        d["staged_views_built"] = staged
    d.update(extra)
    return d


def run_gate(old, new, *more):
    with tempfile.TemporaryDirectory() as td:
        po, pn = os.path.join(td, "o.json"), os.path.join(td, "n.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        r = subprocess.run([sys.executable, DIFF, po, pn, "--gate", *more],
                           capture_output=True, text=True)
        return r.returncode, r.stdout + r.stderr


def check(name, cond, out=""):
    if cond:
        print(f"PASS {name}")
    else:
        print(f"FAIL {name}\n{out}")
        sys.exit(1)


base = {"q_fast": 1.0, "q_slow": 10.0}

# 1. declared refusal erring on both sides: gate PASSES
old = record({**base, "q_dedup_embedding": {"err": REFUSAL}})
new = record({**base, "q_dedup_embedding": {"err": REFUSAL}})
rc, out = run_gate(old, new)
check("declared refusal both-sides -> PASS", rc == 0, out)

# 2. UNDECLARED query erring on both sides: gate FAILS
old = record({**base, "q_bm25_topk": {"err": "java.lang.OutOfMemoryError"}})
new = record({**base, "q_bm25_topk": {"err": "java.lang.OutOfMemoryError"}})
rc, out = run_gate(old, new)
check("undeclared both-sides error -> FAIL", rc == 1 and
      "not a declared expected refusal" in out, out)

# 3. declared refusal with a DRIFTED message: gate FAILS
old = record({**base, "q_dedup_embedding": {"err": REFUSAL}})
new = record({**base, "q_dedup_embedding": {"err": "NullPointerException"}})
rc, out = run_gate(old, new)
check("declared refusal, drifted message -> FAIL", rc == 1 and
      "message drifted" in out, out)

# 4. newly-erring query (ran in OLD): gate FAILS — even the declared one
old = record({**base, "q_dedup_embedding": 5.0})
new = record({**base, "q_dedup_embedding": {"err": REFUSAL}})
rc, out = run_gate(old, new)
check("newly errs -> FAIL", rc == 1 and "errs in NEW" in out, out)

# 5. declared refusal that suddenly RUNS: gate passes with a ?? warning
old = record({**base, "q_dedup_embedding": {"err": REFUSAL}})
new = record({**base, "q_dedup_embedding": 5.0})
rc, out = run_gate(old, new)
check("declared refusal now runs -> PASS + warn", rc == 0 and
      "now RUNS" in out, out)

# 6. plain regression still FAILS
old = record(dict(base))
new = record({**base, "q_slow": 20.0})
rc, out = run_gate(old, new)
check("2x regression -> FAIL", rc == 1 and "gate)" in out, out)

# 7. staged charge >= best-of-2 min: surfaced, and NOT subtracted — the
# build provably isn't inside the min, and clamping the query to 0 would
# mask a real regression in v itself
old = record(dict(base))
new = record({**base, "q_slow": 20.0}, staged={"q_slow": {"view": 21.0}})
rc, out = run_gate(old, new)
check("oversized staged charge -> excluded, regression still gates",
      rc == 1 and "NOT subtracted" in out and "q_slow" in out, out)

# 8. staged charge < value: subtracted as before (cold-staging record
# diffable against warm without tripping the gate)
old = record(dict(base))
new = record({**base, "q_slow": 12.0}, staged={"q_slow": {"view": 4.0}})
rc, out = run_gate(old, new)
check("partial staged charge -> subtracted, no false gate", rc == 0, out)

# --- round-17 contamination refusal ---------------------------------------

CLEAN_CAL = dict(calib_pre_sec=0.80, calib_post_sec=0.81,
                 calib_par_pre_sec=0.96, calib_par_post_sec=0.97)
DIRTY_CAL = dict(calib_pre_sec=0.82, calib_post_sec=0.85,   # serial reads clean
                 calib_par_pre_sec=1.30, calib_par_post_sec=1.28)  # idx ~1.59

# 9. NEW record with a contaminated parallel contention index: gate
# REFUSES (exit 2) even though per-query ratios would flag regressions
old = record({"q_a": 3.0, "q_b": 5.0}, **CLEAN_CAL)
new = record({"q_a": 5.0, "q_b": 8.0}, **DIRTY_CAL)
rc, out = run_gate(old, new)
check("contaminated par index -> REFUSED exit 2", rc == 2 and
      "GATE REFUSED" in out and "parallel contention index" in out, out)

# 10. --force-gate overrides the refusal and the regression still flags
rc, out = run_gate(old, new, "--force-gate")
check("--force-gate gates anyway", rc == 1 and "force-gate" in out and
      "gate)" in out, out)

# 11. clean par indexes on BOTH sides: no refusal, regression gates normally
new = record({"q_a": 5.0, "q_b": 8.0}, **CLEAN_CAL)
rc, out = run_gate(old, new)
check("clean par index -> normal gate FAIL", rc == 1 and
      "GATE REFUSED" not in out, out)

# 12. contaminated calib_par_mid (serial brackets clean): still refused —
# the mid-suite burst is exactly the r10/r11 forensic blind spot
old = record({"q_a": 3.0}, **CLEAN_CAL)
new = record({"q_a": 3.0}, calib_mid=[0.80], calib_par_mid=[1.40], **CLEAN_CAL)
rc, out = run_gate(old, new)
check("contaminated calib_par_mid -> REFUSED", rc == 2, out)

# 13. uniform inflation on a probe-less pair (the BENCH_r16 driver-record
# shape: serial calib clean, every query up ~1.4x): REFUSED
wide_old = {f"q_{i:03d}": 3.0 for i in range(40)}
wide_new = {f"q_{i:03d}": 4.2 for i in range(40)}
rc, out = run_gate(record(wide_old), record(wide_new))
check("probe-less uniform inflation -> REFUSED", rc == 2 and
      "uniform inflation" in out, out)

# 14. same uniform shape but BOTH records carry clean par probes: the
# probes are authoritative — no refusal, the movers gate as regressions
rc, out = run_gate(record(wide_old, **CLEAN_CAL), record(wide_new, **CLEAN_CAL))
check("uniform shape but clean probes -> gates normally", rc == 1 and
      "GATE REFUSED" not in out, out)

# 15. uniform SPEEDUP never refuses (the gate flags regressions only)
wide_fast = {f"q_{i:03d}": 1.8 for i in range(40)}
rc, out = run_gate(record(wide_old), record(wide_fast))
check("uniform speedup -> PASS, no refusal", rc == 0, out)

# 16. ADVICE r16: explicit "calib_mid": null must not crash calib_worst,
# and a 0.0 calib reading on ONE side is an infinite sentinel divergence
# -- the not-box-comparable warning must print, not silently skip
old = record({"q_a": 1.0}, calib_mid=None, calib_pre_sec=0.8, calib_post_sec=0.8)
new = record({"q_a": 1.0}, calib_pre_sec=0.0, calib_post_sec=0.0)
rc, out = run_gate(old, new)
check("null calib_mid + one-sided zero calib -> warns, no crash",
      rc == 0 and "Traceback" not in out and "not box-comparable" in out, out)

# 16b. zero calib on BOTH sides: equal sentinels, no divergence warning
rc, out = run_gate(record({"q_a": 1.0}, calib_pre_sec=0.0, calib_post_sec=0.0),
                   record({"q_a": 1.0}, calib_pre_sec=0.0, calib_post_sec=0.0))
check("both-sides zero calib -> no warning, no crash",
      rc == 0 and "not box-comparable" not in out, out)

# --- round-18 continuous load-trace transient classifier ------------------

def trace(*samples):
    # [[t, loadavg, ping], ...]; baseline ping 0.035s
    return [list(s) for s in samples]

QUIET = [(t, 31.0, 0.036) for t in range(0, 60, 3)]

# 17. flagged mover whose NEW span holds >=2 hot pings AND the burst is
# visible outside the span too (query-agnostic = external):
# self-adjudicated as an in-suite transient — reported with ?? but the
# gate PASSES
old = record({"q_a": 3.0, "q_slow": 10.0}, **CLEAN_CAL)
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace(*[s for s in QUIET if s[0] < 3],
                              (4, 40.0, 0.078),           # hot in q_a's span
                              *[s for s in QUIET if 4 < s[0] < 20],
                              (21, 45.0, 0.080), (24, 44.0, 0.075),
                              (27, 40.0, 0.070),
                              *[s for s in QUIET if s[0] > 28]))
rc, out = run_gate(old, new)
check("burst in mover's span + outside evidence -> transient, gate PASSES",
      rc == 0 and "self-adjudicated" in out and "q_slow" in out and
      "load_trace:" in out, out)

# 17b. burst CONFINED to the mover's own span (quiet everywhere else):
# indistinguishable from load the regressed plan generates itself — the
# flag STANDS (r18 review: a spill storm's D-state load starts and
# stops exactly with the query and must not self-excuse)
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace(*[s for s in QUIET if s[0] < 20],
                              (21, 45.0, 0.080), (24, 44.0, 0.075),
                              (27, 40.0, 0.070),
                              *[s for s in QUIET if s[0] > 28]))
rc, out = run_gate(old, new)
check("burst confined to mover's own span -> still FAILS", rc == 1 and
      "q_slow" in out, out)

# 18. single hot ping in the span (a System.gc() pause shape): NOT a
# transient — the regression still gates
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace(*[s for s in QUIET if s[0] < 20],
                              (21, 45.0, 0.080),
                              *[s for s in QUIET if s[0] > 22]))
rc, out = run_gate(old, new)
check("single hot ping -> still FAILS", rc == 1 and "q_slow" in out, out)

# 19. burst entirely OUTSIDE the mover's span: still FAILS (the trace
# only excuses what it actually covers)
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace((1, 45.0, 0.080), (4, 44.0, 0.078),
                              (7, 43.0, 0.075),
                              *[s for s in QUIET if s[0] > 8]))
rc, out = run_gate(old, new)
check("burst outside span -> still FAILS", rc == 1 and
      "1.3x gate" in out, out)

# 19b. loadavg-over-capacity clause: normal pings (e.g. a D-state/disk
# burst that never starves the cpu sampler) but in-span loadavg far over
# the box's 32 cpus -> transient via clause (b); needs the "cpus" field
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL, cpus=32,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace(*[s for s in QUIET if s[0] < 3],
                              (4, 44.0, 0.037),           # outside evidence
                              *[s for s in QUIET if 4 < s[0] < 20],
                              (21, 45.0, 0.037), (24, 44.0, 0.038),
                              *[s for s in QUIET if s[0] > 25]))
rc, out = run_gate(old, new)
check("loadavg-over-capacity burst -> transient, gate PASSES", rc == 0 and
      "self-adjudicated" in out, out)

# 19c. same loadavg burst WITHOUT the cpus field: the bar is unknowable,
# clause (b) is off, and the regression still gates
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0},
             load_trace=trace(*[s for s in QUIET if s[0] < 20],
                              (21, 45.0, 0.037), (24, 44.0, 0.038),
                              *[s for s in QUIET if s[0] > 25]))
rc, out = run_gate(old, new)
check("loadavg burst without cpus field -> still FAILS", rc == 1, out)

# 20. clean trace -> summary printed, regression gates normally
new = record({"q_a": 3.0, "q_slow": 20.0}, **CLEAN_CAL,
             t_end={"q_a": 8.0, "q_slow": 52.0}, load_trace=trace(*QUIET))
rc, out = run_gate(old, new)
check("clean trace -> summary + normal FAIL", rc == 1 and
      "load_trace" in out and "samples" in out, out)

# --- round-18 memory-bandwidth sentinel -----------------------------------

# 21. NEW record's bandwidth >30% below OLD's: REFUSED — scan-heavy
# regression flags would be bandwidth skew, not plans
old = record({"q_scan": 3.0, "q_b": 1.0}, **CLEAN_CAL,
             calib_bw_pre_gbps=6.0, calib_bw_post_gbps=6.2)
new = record({"q_scan": 6.0, "q_b": 1.0}, **CLEAN_CAL,
             calib_bw_pre_gbps=1.5, calib_bw_post_gbps=1.6)
rc, out = run_gate(old, new)
check("bandwidth-skewed pair -> REFUSED", rc == 2 and
      "bandwidth-skewed" in out, out)

# 22. comparable bandwidth: gates normally (regression still flags)
new = record({"q_scan": 6.0, "q_b": 1.0}, **CLEAN_CAL,
             calib_bw_pre_gbps=5.8, calib_bw_post_gbps=6.1)
rc, out = run_gate(old, new)
check("comparable bandwidth -> normal gate FAIL", rc == 1 and
      "bandwidth-skewed" not in out, out)

# 23. NEW much FASTER: warns (masking) but does not refuse
new = record({"q_scan": 2.9, "q_b": 1.0}, **CLEAN_CAL,
             calib_bw_pre_gbps=9.0, calib_bw_post_gbps=9.2)
rc, out = run_gate(old, new)
check("faster box -> masking warning, no refusal", rc == 0 and
      "MASK" in out, out)

# 24. records without the field (pre-r18): comparison skipped silently
rc, out = run_gate(record({"q_a": 1.0}, **CLEAN_CAL),
                   record({"q_a": 1.0}, **CLEAN_CAL))
check("bw absent -> skipped", rc == 0 and "memory bandwidth" not in out, out)

print("all bench_diff gate tests passed")
