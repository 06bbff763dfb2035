#!/usr/bin/env python3
"""Merge per-wave fork bench artifacts into one committed artifact.

Usage: merge_bench.py OUT IN1 [IN2 ...]

Later inputs override earlier ones per query (a remediation wave's
rerun replaces the failed first attempt). `failed` is recomputed as
the union of per-input failures minus every query that succeeded in
ANY input. Metadata (sf, fork, reps) must agree across inputs; wall
times sum.
"""
import json
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    queries: dict[str, float] = {}
    failed: set[str] = set()
    meta = None
    wall = 0.0
    for path in ins:
        with open(path) as f:
            d = json.loads(f.readline())
        this_meta = {k: d.get(k) for k in ("unit", "sf", "fork", "reps")}
        if meta is None:
            meta = this_meta
        elif this_meta != meta:
            # mixed scale factors / rep counts would merge into a
            # mislabeled artifact stamped with the first input's
            # metadata (r20 advice)
            sys.exit(f"metadata mismatch: {path} has {this_meta}, "
                     f"first input had {meta}")
        for q, v in d["queries"].items():
            if v >= 0:
                queries[q] = v
                failed.discard(q)
            elif q not in queries:
                failed.add(q)
        for q in d.get("failed", []):
            if q not in queries:
                failed.add(q)
        wall += d.get("wall_sec", 0.0)
    qs = dict(sorted(queries.items(), key=lambda kv: kv[1]))
    for q in sorted(failed):
        qs[q] = -1.0
    art = {
        "metric": "total", "unit": meta["unit"], "sf": meta["sf"],
        "fork": meta.get("fork", 0), "rep_outliers": {},
        "queries": qs, "failed": sorted(failed),
        "value": sum(queries.values()),
        "reps": meta.get("reps", 1), "wall_sec": wall,
    }
    # value_min == value only holds at reps=1 (per-query min == its
    # only rep); at reps>1 the children's minima are not in the merged
    # inputs, so emitting value_min would overstate it — omit instead
    # (r20 advice, medium)
    if meta.get("reps", 1) == 1:
        art["value_min"] = art["value"]
    with open(out, "w") as f:
        json.dump(art, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out}: {len(queries)} ok, {sorted(failed)} failed, "
          f"value={art['value']:.1f}s")


if __name__ == "__main__":
    main()
