#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table in
<sfDir> as a DuckDB view, runs each oracle statement, and compares it to
the Spark result at <verifyOutDir>/<name>/ (parquet): columns sorted by
name, values compared cell-by-cell (exact for non-floats, tight tolerance
for floats), and row order respected.

NOT part of the shipped library — dev tooling only (driver-side python).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for comparison."""
    import decimal
    import datetime
    import numpy as np
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (np.datetime64,)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return str(v.replace(tzinfo=None))
    if isinstance(v, (list, np.ndarray)):
        return tuple(canon(x) for x in v)
    return v


def eq(a, b):
    a, b = canon(a), canon(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b) \
            and a[:1] != ("dec",):
        if all(isinstance(x, tuple) or not isinstance(x, str) for x in (a, b)):
            pass
    if isinstance(a, float) or isinstance(b, float):
        # Type-class mismatch (one engine integral, the other float —
        # e.g. an uncast DuckDB HUGEINT fetched as float64) fails the
        # driver's exact hash even when values agree; flag it here too.
        if isinstance(a, int) != isinstance(b, int):
            return False
        try:
            af, bf = float(a if not isinstance(a, tuple) else a[1]), \
                     float(b if not isinstance(b, tuple) else b[1])
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    if isinstance(a, tuple) and a and a[0] == "dec" and isinstance(b, tuple) and b[0] == "dec":
        return a[1] == b[1]
    if isinstance(a, tuple) and a and a[0] == "dec":
        return float(a[1]) == float(b) if not isinstance(b, tuple) else a == b
    if isinstance(b, tuple) and b and b[0] == "dec":
        return float(b[1]) == float(a) if not isinstance(a, tuple) else a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tbl in TABLES:
        p = Path(sf_dir) / f"{tbl}.parquet"
        if p.exists():
            # driver fixtures are single files; GenScale-derived ones
            # (sf1/sf10/zipf) are Spark directory-style parquet
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{src}')")
    # a streaming-only Verify run (filter "__streaming__") writes no
    # oracle_sql.json — gate only the sections that are present
    oracle_path = Path(out_dir) / "oracle_sql.json"
    oracle = json.loads(oracle_path.read_text()) if oracle_path.exists() \
        else {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetch_df()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        bad = None
        for c in ocols:
            ov, sv = odf[c].tolist(), sdf[c].tolist()
            for i, (x, y) in enumerate(zip(ov, sv)):
                if not eq(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1
    # pinned metrics for the rows-only queries (emitted by graft.Verify
    # since round 19): machine-checkable recall floors / error bounds /
    # ground-truth parity — a failed pin fails the local gate like an
    # oracle mismatch would.
    n_pin_pass = n_pin_fail = 0
    pinned_path = Path(out_dir) / "pinned.json"
    if pinned_path.exists():
        pinned = json.loads(pinned_path.read_text())
        for name, pins in sorted(pinned.items()):
            if only and name not in only:
                continue
            for p in pins:
                ok = p["pass"]
                tag = "PIN-PASS" if ok else "PIN-FAIL"
                print(f"{tag} {name}: {p['metric']} = {p['value']:.6g} "
                      f"{p['op']} {p['bound']:.6g}")
                if ok:
                    n_pin_pass += 1
                else:
                    n_pin_fail += 1
        print(f"== pinned: {n_pin_pass} pass, {n_pin_fail} fail ==")
    # streaming batch-equivalence records (emitted by graft.Verify since
    # round 20): the 22 spec-only streaming/source components re-proven
    # Verify-side — a mismatch fails the gate like an oracle miss.
    n_str_pass = n_str_fail = 0
    streaming_path = Path(out_dir) / "streaming.json"
    if streaming_path.exists() and not only:
        streaming = json.loads(streaming_path.read_text())
        for cid, c in sorted(streaming.items()):
            ok = c["match"]
            tag = "STREAM-PASS" if ok else "STREAM-FAIL"
            print(f"{tag} {cid}: {c['impl']} == {c['twin']} "
                  f"({c['rows_compared']} rows) [{c['note']}]")
            if ok:
                n_str_pass += 1
            else:
                n_str_fail += 1
        print(f"== streaming: {n_str_pass} pass, {n_str_fail} fail ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if (n_fail or n_pin_fail or n_str_fail) else 0)


if __name__ == "__main__":
    main()
