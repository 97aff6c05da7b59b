#!/usr/bin/env python3
"""Compare two graft.Bench detail JSON records query by query.

Usage: python3 dev/bench_diff.py OLD.json NEW.json [--top N] [--min-sec S]

Prints total/probe/calibration identity for both records, then the
per-query wall-time table sorted by absolute delta (descending), hiding
rows where both sides are under --min-sec (default 0.25 s, noise).
Queries present on only one side are listed separately — a silently
shrunk suite reads as a speedup otherwise. Records taken under
different probes (`probe` field, absent = legacy count()-probe) are
flagged NOT COMPARABLE but still diffed (the skew itself is the
interesting signal during a probe re-baseline).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:]
            if a.startswith("--") and "=" in a}
    top = int(opts.get("--top", 1000))
    min_sec = float(opts.get("--min-sec", 0.25))
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

    def qmap(d):
        out = {}
        for k, v in d.get("queries", {}).items():
            out[k] = v if isinstance(v, (int, float)) else None  # "err" marker
        return out

    qo, qn = qmap(old), qmap(new)
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

    print(f"\n{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>7s}")
    shown = 0
    for _, q, a, b in rows:
        if shown >= top:
            print(f"... {len(rows) - top} more rows over {min_sec}s hidden (--top)")
            break
        sa = "err" if a is None else f"{a:.3f}"
        sb = "err" if b is None else f"{b:.3f}"
        if a is None or b is None:
            print(f"{q:40s} {sa:>8s} {sb:>8s} {'—':>8s} {'—':>7s}")
        else:
            ratio = f"{b / a:.2f}x" if a > 0 else "—"
            print(f"{q:40s} {sa:>8s} {sb:>8s} {b - a:>+8.3f} {ratio:>7s}")
        shown += 1


if __name__ == "__main__":
    main()
