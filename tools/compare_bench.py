#!/usr/bin/env python3
"""Diff two bench outputs per query: flags regressions and improvements.

Usage: compare_bench.py OLD NEW [ratio]

OLD / NEW each accept either a driver artifact (BENCH_rN.json, with the
line under "parsed") or a raw Bench stdout file containing the one-line
{"metric": ...} JSON. Default flag threshold is 1.4x either way.

Single local[32] runs drift 10-20% with host load (a loaded host shows
UNIFORM drift across untouched queries) — before believing any flagged
regression, check whether the drift is uniform, and re-run min-of-N on
an idle host.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "parsed" in doc:  # driver artifact
            doc = doc["parsed"]
        if isinstance(doc, dict) and "queries" in doc:
            return doc
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():  # raw Bench stdout
        if line.startswith('{"metric"'):
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                # the driver keeps only a ~2KB stdout tail — a clipped
                # metric line should diagnose, not traceback
                raise SystemExit(
                    f"{path}: bench JSON line is truncated/corrupt")
            if "queries" in doc:
                return doc
    raise SystemExit(f"{path}: no bench JSON with a 'queries' map found")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    print(f"totals: {old.get('value')} s ({len(oq)} reported) -> "
          f"{new.get('value')} s ({len(nq)} reported); {len(common)} comparable")
    # a 0.00s OLD time is the worst possible regression baseline —
    # never drop it silently; treat it as an arbitrarily large ratio
    rows = [((nq[k] / oq[k]) if oq[k] > 0 else float("inf"),
             k, oq[k], nq[k]) for k in common]
    regs = sorted((r for r in rows if r[0] >= thresh), reverse=True)
    imps = sorted(r for r in rows if r[0] <= 1 / thresh)
    for title, rs in ((f"regressions >= {thresh}x", regs),
                      (f"improvements <= {1/thresh:.2f}x", imps)):
        print(f"{title}: {len(rs)}")
        for ratio, k, o, n in rs:
            print(f"  {k}: {o:.2f} -> {n:.2f} ({ratio:.2f}x)")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new-only queries: {', '.join(only_new)}")
    if regs and len(regs) > len(common) // 3:
        print("NOTE: >1/3 of comparable queries regressed — "
              "uniform drift smells like host load, not code.")


if __name__ == "__main__":
    main()
