#!/usr/bin/env python3
"""Compare two graft.Bench detail JSON records query by query.

Usage: python3 dev/bench_diff.py OLD.json NEW.json [--top N] [--min-sec S]
       python3 dev/bench_diff.py OLD.json NEW.json --gate \
           [--gate-ratio=1.3] [--gate-min-sec=2] \
           [--gate-ratio2=1.5] [--gate-min-sec2=0.5]

Prints total/probe/calibration identity for both records, then the
per-query wall-time table sorted by absolute delta (descending), hiding
rows where both sides are under --min-sec (default 0.25 s, noise).
Queries present on only one side are listed separately — a silently
shrunk suite reads as a speedup otherwise. Records taken under
different probes (`probe` field, absent = legacy count()-probe) are
flagged NOT COMPARABLE but still diffed (the skew itself is the
interesting signal during a probe re-baseline). Per-query seconds have
any `staged_views_built` build time subtracted on BOTH sides before
diffing and gating (the BASELINE.md interpretation rule, in code) —
the table shows the raw charge as a `+Ns` suffix on the affected side.

--gate turns the diff into the SCALE REGRESSION GATE (BASELINE.md "100x
regression gate"): exit 1 if any query at or above --gate-min-sec
(default 2 s) on EITHER side regressed by more than --gate-ratio
(default 1.3x), or errs on the NEW side, or disappeared from the NEW
record. A SECOND, looser tier covers the band the 2 s floor hides:
queries at or above --gate-min-sec2 (default 0.5 s) regressing by more
than --gate-ratio2 (default 1.5x) also flag — round 13 had four 1.3-1.6x
movers in the 0.5-2 s band that the single-tier gate never surfaced. This is how the next quadratic plan shape gets caught the round
it lands instead of by a future probe overhaul — run it against the
committed 100x record after any plan-affecting change:

    python3 dev/make_sfbig.py /root/testdata/sf0.1 /tmp/sfbig100 100
    SPARK_GRAFT_SF_DIR=/tmp/sfbig100 SPARK_GRAFT_CPUS=32 \
        sbt -batch "runMain graft.Bench"
    python3 dev/bench_diff.py BENCH_DETAIL__tmp_sfbig100.json \
        BENCH_DETAIL__tmp_sfbig100.json.new --gate

(Bench writes the fresh record to BENCH_DETAIL__tmp_sfbig100.json in
the repo root — copy the committed one aside first, or diff against
`git show HEAD:BENCH_DETAIL__tmp_sfbig100.json` written to a temp file.)

CONTAMINATION REFUSAL (round 17): --gate REFUSES to gate (exit 2, no
per-query verdict) when either record is machine-detectably contaminated:
  (a) its parallel contention index — worst pairwise
      calib_par_*/calib_* ratio — exceeds 1.35 (idle ~1.2 on the 32-cpu
      box, ~1.5 under just 8 external busy threads; BASELINE.md
      "parallel contention index"), or
  (b) [records predating the par probe] the pair shows UNIFORM
      inflation: the median per-query NEW/OLD ratio over >=30 shared
      queries exceeds 1.15 — codeless queries don't all slow down 15%+
      together for plan reasons (BENCH_r16's driver record inflated 71
      codeless queries 1.3-2.7x while its serial calib read clean).
--force-gate gates anyway (prints the contamination verdict first).
A refusal is loud by design: adjudicate the box, don't read the flags.
"""
import json
import statistics
import sys

# Parallel contention index above which a record is CONTAMINATED: worst
# pairwise calib_par/calib ratio. Measured on the 32-cpu box (r17):
# idle 1.14-1.22; 8 external busy threads -> 1.48-1.53. 1.35 splits the
# two populations with margin on both sides.
CONTENTION_IDX_MAX = 1.35
# Uniform-inflation fallback for record PAIRS without the par probe:
# median per-query ratio above this (over >=30 shared queries) means the
# pair is box-skewed, not plan-changed.
UNIFORM_INFLATION_MEDIAN = 1.15
UNIFORM_INFLATION_MIN_QUERIES = 30

# Continuous load-trace transient classifier (round 18): a flagged mover
# whose NEW-record span contains >=2 HOT samples is classified an
# IN-SUITE TRANSIENT — box state visible in the record itself, not a
# plan change. A sample is hot when EITHER
#   (a) its ping exceeds PING_TRANSIENT_RATIO x the record's own
#       baseline (min) ping — cycles were stolen from the sampler
#       thread itself, which only happens when total demand exceeds the
#       box (measured r18 on the 32-cpu box: quiet-suite steady-state
#       pings sit at 1.0-1.3x; 8 external busy threads against a LIGHT
#       suite leave 24 cores free and the ping reads 1.0-1.14x — cpu
#       starvation needs over-saturation, hence clause b); or
#   (b) its 1-min loadavg exceeds the record's box capacity ("cpus"
#       field) + LOAD_OVER_CAPACITY_MARGIN — demand above what the box
#       can serve, regardless of whether the sampler thread itself got
#       scheduled (loadavg also counts D-state, so disk-contention
#       bursts that never starve a cpu ping still show).
# >=2 samples (~3 s apart) so a single System.gc() pause between
# queries cannot masquerade as a burst. AND the record must carry >=1
# hot sample OUTSIDE the mover's own span: an external burst is
# query-agnostic (the r17 incident spanned three queries plus the gaps
# between them), while load a regressed plan generates ITSELF — a new
# spill storm's D-state, a task blowup — starts and stops exactly with
# the query; without the outside-evidence clause such a regression
# would self-excuse its own gate flag (r18 review).
PING_TRANSIENT_RATIO = 1.4
LOAD_OVER_CAPACITY_MARGIN = 4.0
PING_TRANSIENT_MIN_SAMPLES = 2

# Memory-bandwidth sentinel (round 18): records carry calib_bw_* GB/s
# (single-thread 4x256MiB arraycopy). The CPU probes are register-bound
# and BLIND to host-side memory-bandwidth contention: r18 measured a
# bandwidth-bound scan-agg (q1_agg) 24x slower with IDENTICAL code,
# clean serial+parallel calibrations, the file page-cached and loadavg
# ~0 — the only abnormal reading was memcpy at 1.5 GB/s. A NEW record
# whose median bandwidth is >30% BELOW the OLD one's cannot be gated:
# every scan-heavy regression flag would be bandwidth skew. (NEW faster
# by >30% only warns: the gate flags regressions, and a faster box can
# only mask them — same asymmetry as the uniform-inflation rule.)
BW_SKEW_RATIO = 1.3

# Queries that err BY DESIGN at scale fixtures (query -> required message
# fragment). q_dedup_embedding is the exact all-pairs oracle-baseline tier:
# its row-cap guard refuses O(N^2) input at the 100x fixture and points at
# the LSH scale path (Dedup.exactEmbeddingTopPairs). The gate accepts a
# both-sides error ONLY for these, and ONLY while the message still
# matches — any other query erring in both records fails loudly instead
# of passing by accident of erring twice.
EXPECTED_REFUSALS = {
    "q_dedup_embedding": "exact all-pairs embedding tier is O(N",
}


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:]
            if a.startswith("--") and "=" in a}
    flags = {a for a in sys.argv[1:] if a.startswith("--") and "=" not in a}
    top = int(opts.get("--top", 1000))
    min_sec = float(opts.get("--min-sec", 0.25))
    gate = "--gate" in flags
    gate_ratio = float(opts.get("--gate-ratio", 1.3))
    gate_min = float(opts.get("--gate-min-sec", 2.0))
    gate_ratio2 = float(opts.get("--gate-ratio2", 1.5))
    gate_min2 = float(opts.get("--gate-min-sec2", 0.5))
    old, new = load(args[0]), load(args[1])

    def ident(d, name):
        calib = (d.get("calib_pre_sec"), d.get("calib_post_sec"))
        print(f"{name}: total={d.get('value', '?')}s sf={d.get('sf', '?')} "
              f"probe={d.get('probe', 'count() [legacy]')} "
              f"filtered={d.get('filtered', False)} calib={calib} "
              f"calib_mid={d.get('calib_mid', [])}")

    ident(old, "OLD")
    ident(new, "NEW")
    if old.get("probe") != new.get("probe"):
        print("!! probe identity differs — totals NOT COMPARABLE "
              "(per-query deltas show the probe skew)")
    ho, hn = old.get("heap_gb"), new.get("heap_gb")
    if isinstance(ho, (int, float)) and isinstance(hn, (int, float)) and ho != hn:
        print(f"!! heap regime differs (OLD {ho}g vs NEW {hn}g) — totals "
              f"NOT COMPARABLE: at the 100x fixture identical plans "
              f"measured 2-4x slower GC-bound at 8g than at 96g")

    def calib_worst(d):
        # `or []` / `or None`: a record carrying an explicit null for any
        # of these fields must read as "absent", not crash list(None)
        vals = [v for v in [d.get("calib_pre_sec"), d.get("calib_post_sec")]
                + list(d.get("calib_mid") or []) if isinstance(v, (int, float))]
        return max(vals) if vals else None

    def contention_index(d):
        # Worst pairwise parallel/serial calibration ratio — the r17
        # multicore contention signal (None when the record predates the
        # par probe). Pairs: (pre, par_pre), (post, par_post), and
        # zip(calib_mid, calib_par_mid) positionally.
        pairs = [(d.get("calib_pre_sec"), d.get("calib_par_pre_sec")),
                 (d.get("calib_post_sec"), d.get("calib_par_post_sec"))]
        pairs += list(zip(d.get("calib_mid") or [], d.get("calib_par_mid") or []))
        ratios = [p / s for s, p in pairs
                  if isinstance(s, (int, float)) and isinstance(p, (int, float))
                  and s > 0]
        return max(ratios) if ratios else None

    co, cn = calib_worst(old), calib_worst(new)
    # `is not None`: a legitimate 0.0 must not silently skip the check —
    # a zero on ONE side is an infinite sentinel divergence, not a skip
    if co is not None and cn is not None and \
            (min(co, cn) == 0 < max(co, cn) or
             (min(co, cn) > 0 and max(co, cn) / min(co, cn) > 1.10)):
        # round-16 lesson: three same-HEAD 100x runs spanned 592-662 s
        # purely on host contention, with the flagged-mover SET flipping
        # between runs — a gate FAIL between records whose calibration
        # sentinels disagree is a box-state statement until proven
        # otherwise (isolated re-probes of the flagged movers)
        print(f"!! calibration sentinels differ (worst OLD {co:.3f}s vs "
              f"NEW {cn:.3f}s, >10%): records are not box-comparable — "
              f"adjudicate gate flags with isolated re-probes before "
              f"reading them as plan regressions")

    contaminated = []  # (record name, reason) — drives the gate refusal

    def bw_median(d):
        vals = [v for v in [d.get("calib_bw_pre_gbps"),
                            d.get("calib_bw_post_gbps")]
                + list(d.get("calib_bw_mid") or [])
                if isinstance(v, (int, float)) and v > 0]
        if not vals:
            return None
        return statistics.median(vals)

    bwo, bwn = bw_median(old), bw_median(new)
    if bwo is not None and bwn is not None:
        print(f"memory bandwidth: OLD {bwo:.2f} GB/s, NEW {bwn:.2f} GB/s "
              f"(median of calib_bw samples)")
        if bwn < bwo / BW_SKEW_RATIO:
            contaminated.append(
                ("PAIR", f"bandwidth-skewed pair: NEW moved "
                 f"{bwn:.2f} GB/s vs OLD {bwo:.2f} — scan-heavy "
                 f"regression flags would be box noise"))
        elif bwn > bwo * BW_SKEW_RATIO:
            print(f"!! NEW bandwidth {bwn:.2f} GB/s is >{BW_SKEW_RATIO}x "
                  f"OLD {bwo:.2f} — a faster box can MASK regressions; "
                  f"treat a clean gate as provisional")
    for name, d in (("OLD", old), ("NEW", new)):
        idx = contention_index(d)
        if idx is not None:
            verdict = "CONTAMINATED" if idx > CONTENTION_IDX_MAX else "clean"
            print(f"{name}: parallel contention index {idx:.2f} "
                  f"(max pairwise calib_par/calib; idle ~1.2, "
                  f"threshold {CONTENTION_IDX_MAX}) -> {verdict}")
            if idx > CONTENTION_IDX_MAX:
                contaminated.append((name, f"parallel contention index "
                                     f"{idx:.2f} > {CONTENTION_IDX_MAX}"))

    def trace(d):
        # [[t, loadavg, ping], ...] every ~3 s, same t origin as t_end
        out = []
        for row in d.get("load_trace") or []:
            if (isinstance(row, list) and len(row) == 3
                    and all(isinstance(v, (int, float)) for v in row)):
                out.append(tuple(row))
        return sorted(out)

    def spans(d):
        # queries run in name-sorted order (Bench sorts before timing),
        # so each query's span is (previous query's t_end, its t_end)
        tend = {k: v for k, v in (d.get("t_end") or {}).items()
                if isinstance(v, (int, float))}
        out, prev = {}, 0.0
        for q in sorted(tend, key=lambda k: tend[k]):
            out[q] = (prev, tend[q])
            prev = tend[q]
        return out

    def span_transient(d, q, tr, base_ping):
        # >=2 in-span HOT samples (ping starved OR loadavg over box
        # capacity) => the burst is visible in the record itself.
        # Returns a description string, or None.
        span = spans(d).get(q)
        if span is None or not tr or not base_ping:
            return None
        cap = d.get("cpus")
        load_bar = (cap + LOAD_OVER_CAPACITY_MARGIN
                    if isinstance(cap, (int, float)) else float("inf"))

        def hot(s):
            return s[2] / base_ping > PING_TRANSIENT_RATIO or s[1] > load_bar
        hits = [s for s in tr if span[0] <= s[0] <= span[1] and hot(s)]
        outside = [s for s in tr if not span[0] <= s[0] <= span[1] and hot(s)]
        if len(hits) >= PING_TRANSIENT_MIN_SAMPLES and outside:
            worst = max(hits, key=lambda s: max(s[2] / base_ping,
                                                s[1] / max(load_bar, 1.0)))
            return (f"load_trace: {len(hits)} in-span + {len(outside)} "
                    f"outside-span hot samples "
                    f"(ping > {PING_TRANSIENT_RATIO}x base or loadavg > "
                    f"{load_bar:.0f}; worst in-span ping "
                    f"{worst[2] / base_ping:.2f}x, loadavg {worst[1]:.1f} "
                    f"at t={worst[0]:.0f}s)")
        return None

    tr_old, tr_new = trace(old), trace(new)
    base_old = min((p for (_, _, p) in tr_old), default=None)
    base_new = min((p for (_, _, p) in tr_new), default=None)
    for name, d, tr, base in (("OLD", old, tr_old, base_old),
                              ("NEW", new, tr_new, base_new)):
        if tr and base:
            cap = d.get("cpus")
            load_bar = (cap + LOAD_OVER_CAPACITY_MARGIN
                        if isinstance(cap, (int, float)) else float("inf"))
            pings = sorted(p for (_, _, p) in tr)
            n_hot = sum(1 for (_, l, p) in tr
                        if p / base > PING_TRANSIENT_RATIO or l > load_bar)
            print(f"{name}: load_trace {len(tr)} samples, ping base "
                  f"{base * 1000:.0f}ms median {pings[len(pings) // 2] / base:.2f}x "
                  f"max {pings[-1] / base:.2f}x, loadavg max "
                  f"{max(l for (_, l, _) in tr):.1f}/bar {load_bar:.0f}; "
                  f"{n_hot} hot samples")

    def staged(d):
        # BASELINE.md "Staged-view provenance": per-query one-time staged
        # parquet build seconds charged inside the timed window. Absence
        # means the staging root was warm (or the record predates r15).
        out = {}
        for q, views in d.get("staged_views_built", {}).items():
            if isinstance(views, dict):
                out[q] = sum(s for s in views.values()
                             if isinstance(s, (int, float)))
        return out

    def qmap(d):
        # Subtract staged-view build time up front (the BASELINE.md
        # interpretation rule, applied to BOTH sides): a mover fully
        # explained by a cold staging root is a staging-state difference,
        # not a plan change, and must not trip the gate. The raw seconds
        # stay visible via the "+Ns staged" annotation in the table.
        # Bench reports best-of-2 minima and staged builds are disk-
        # memoized, so a build paid in run 1 is usually NOT inside the
        # reported min at all: when sv >= v the build provably isn't in
        # v, and subtracting would clamp the query to 0 — masking any
        # real regression in v itself. Subtract only a charge smaller
        # than the reported value (partial inclusion plausible); keep v
        # untouched otherwise (the excluded charges are listed below).
        sv = staged(d)
        out = {}
        for k, v in d.get("queries", {}).items():
            if isinstance(v, (int, float)):
                s_sec = sv.get(k, 0.0)
                out[k] = v - s_sec if s_sec < v else v
            else:
                out[k] = None  # "err" marker
        return out

    def errmsg(d, q):
        v = d.get("queries", {}).get(q)
        return v.get("err", "") if isinstance(v, dict) else None

    qo, qn = qmap(old), qmap(new)
    so, sn = staged(old), staged(new)
    for name, d, sv in (("OLD", old, so), ("NEW", new, sn)):
        for q, s_sec in sv.items():
            v = d.get("queries", {}).get(q)
            if isinstance(v, (int, float)) and s_sec >= v:
                print(f"{name} {q}: staged charge {s_sec:.2f}s >= best-of-2 "
                      f"min {v:.2f}s — build excluded from the min, "
                      f"NOT subtracted")
    if so or sn:
        tot_o, tot_n = sum(so.values()), sum(sn.values())
        print(f"staged-view builds charged in-query (subtracted before "
              f"diffing): OLD {tot_o:.2f}s/{len(so)} queries, "
              f"NEW {tot_n:.2f}s/{len(sn)} queries")
        if tot_n > max(2.0, 1.5 * tot_o):
            print(f"!! NEW staged build total {tot_n:.2f}s is >1.5x OLD "
                  f"{tot_o:.2f}s — staging-time regression (the per-query "
                  f"gate subtracts it; check the staging writes themselves)")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"only in OLD ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in NEW ({len(only_new)}): {', '.join(only_new)}")

    rows = []
    for q in sorted(set(qo) & set(qn)):
        a, b = qo[q], qn[q]
        if a is None or b is None:
            rows.append((float("inf"), q, a, b))
        elif max(a, b) >= min_sec:
            rows.append((abs(b - a), q, a, b))
    rows.sort(reverse=True)

    print(f"\n{'query':40s} {'old':>12s} {'new':>12s} {'delta':>8s} {'ratio':>7s}")
    shown = 0
    for _, q, a, b in rows:
        if shown >= top:
            print(f"... {len(rows) - top} more rows over {min_sec}s hidden (--top)")
            break
        sa = "err" if a is None else f"{a:.3f}"
        sb = "err" if b is None else f"{b:.3f}"
        if a is not None and so.get(q):
            sa += f"+{so[q]:.1f}s"
        if b is not None and sn.get(q):
            sb += f"+{sn[q]:.1f}s"
        if a is None or b is None:
            print(f"{q:40s} {sa:>12s} {sb:>12s} {'—':>8s} {'—':>7s}")
        else:
            ratio = f"{b / a:.2f}x" if a > 0 else "—"
            print(f"{q:40s} {sa:>12s} {sb:>12s} {b - a:>+8.3f} {ratio:>7s}")
        shown += 1

    # Uniform-inflation fallback: for pairs where EITHER record predates
    # the par probe, a box-skewed pair is still detectable from the shape
    # of the deltas themselves — the median per-query ratio over a wide
    # shared set should sit ~1.0 between comparable records; >1.15 means
    # the box inflated everything (BENCH_r16: 71 codeless movers).
    # Only the inflation side refuses the gate (the gate flags
    # regressions); a uniform SPEEDUP is reported but gates normally.
    shared_ratios = [qn[q] / qo[q] for q in set(qo) & set(qn)
                     if isinstance(qo.get(q), (int, float))
                     and isinstance(qn.get(q), (int, float))
                     and qo[q] >= 0.15 and qn[q] >= 0.0 and qo[q] > 0]
    both_probed = (contention_index(old) is not None
                   and contention_index(new) is not None)
    if len(shared_ratios) >= UNIFORM_INFLATION_MIN_QUERIES:
        med = statistics.median(shared_ratios)
        if abs(med - 1.0) > 0.10:
            print(f"median per-query ratio over {len(shared_ratios)} shared "
                  f"queries: {med:.2f} (comparable records sit ~1.0)")
        if med > UNIFORM_INFLATION_MEDIAN and not both_probed:
            contaminated.append(
                ("PAIR", f"uniform inflation: median per-query ratio "
                 f"{med:.2f} > {UNIFORM_INFLATION_MEDIAN} over "
                 f"{len(shared_ratios)} shared queries (no par probe to "
                 f"adjudicate) — box-skewed pair, not a plan change"))

    if gate:
        if contaminated and "--force-gate" not in flags:
            print(f"\nGATE REFUSED — contaminated record(s), per-query "
                  f"flags would be box noise:")
            for name, reason in contaminated:
                print(f"  !! {name}: {reason}")
            print("re-record on a quiet box (or --force-gate to override)")
            sys.exit(2)
        if contaminated:
            print("\n?? --force-gate: gating despite contamination:")
            for name, reason in contaminated:
                print(f"  ?? {name}: {reason}")
        flagged = []
        # regression flags whose NEW-record span shows a machine-visible
        # contention burst in the continuous trace: reported loudly but
        # NOT failed — the record itself adjudicates them as box state
        # (a transient on the OLD side would hide regressions, never
        # fabricate them, so only the NEW side downgrades).
        transients = []
        for q in only_old:
            flagged.append(f"{q}: present in OLD, missing from NEW")
        for q in sorted(set(qo) & set(qn)):
            a, b = qo[q], qn[q]
            if a is None and b is None:
                # errs on BOTH sides: acceptable ONLY for a DECLARED
                # expected refusal whose message still matches — before
                # r16 any both-sides error passed silently, so a query
                # that started failing for a NEW reason (and stayed
                # failing) could never trip the gate
                exp = EXPECTED_REFUSALS.get(q)
                msg = errmsg(new, q) or ""
                if exp is None:
                    flagged.append(f"{q}: errs in BOTH records but is not a "
                                   f"declared expected refusal ({msg[:90]})")
                elif exp not in msg:
                    flagged.append(f"{q}: declared refusal message drifted — "
                                   f"expected '{exp}', got '{msg[:90]}'")
                continue
            elif a is None:
                # erred before, runs now: an improvement, not a regression
                # — but a DECLARED refusal that suddenly runs means its
                # guard stopped firing; warn without failing
                if q in EXPECTED_REFUSALS:
                    print(f"  ?? {q}: declared expected refusal now RUNS "
                          f"({b}s) — did its row-cap guard stop firing?")
                continue
            elif b is None:
                flagged.append(f"{q}: errs in NEW (old {a}s)")
            elif max(a, b) >= gate_min and a > 0 and b / a > gate_ratio:
                tr_hit = span_transient(new, q, tr_new, base_new)
                if tr_hit:
                    transients.append(f"{q}: {a:.2f}s -> {b:.2f}s "
                                      f"({b / a:.2f}x) — {tr_hit}")
                else:
                    flagged.append(f"{q}: {a:.2f}s -> {b:.2f}s "
                                   f"({b / a:.2f}x > {gate_ratio}x gate)")
            elif max(a, b) >= gate_min2 and a > 0 and b / a > gate_ratio2:
                tr_hit = span_transient(new, q, tr_new, base_new)
                if tr_hit:
                    transients.append(f"{q}: {a:.2f}s -> {b:.2f}s "
                                      f"({b / a:.2f}x) — {tr_hit}")
                else:
                    flagged.append(f"{q}: {a:.2f}s -> {b:.2f}s "
                                   f"({b / a:.2f}x > {gate_ratio2}x tier-2 gate)")
        if transients:
            print(f"\n{len(transients)} flag(s) self-adjudicated as in-suite "
                  f"transients by the NEW record's load trace (not failed; "
                  f"re-probe to confirm if the query moved for real):")
            for t in transients:
                print(f"  ?? {t}")
        print(f"\nGATE (>= {gate_min}s at > {gate_ratio}x, "
              f"or >= {gate_min2}s at > {gate_ratio2}x): "
              f"{'FAIL' if flagged else 'PASS'}")
        for f in flagged:
            print(f"  !! {f}")
        if flagged:
            sys.exit(1)


if __name__ == "__main__":
    main()
