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


def record(queries, staged=None):
    d = {"metric": "total",
         "value": sum(v for v in queries.values() if isinstance(v, (int, float))),
         "unit": "sec", "probe": "toRdd", "sf": "/tmp/sfbig100",
         "queries": queries}
    if staged:
        d["staged_views_built"] = staged
    return d


def run_gate(old, new):
    with tempfile.TemporaryDirectory() as td:
        po, pn = os.path.join(td, "o.json"), os.path.join(td, "n.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        r = subprocess.run([sys.executable, DIFF, po, pn, "--gate"],
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

print("all bench_diff gate tests passed")
