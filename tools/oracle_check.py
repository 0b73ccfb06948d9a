#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out_dir]

Reads each parquet result dumped by `graft.Verify` and compares it against
the DuckDB result of the matching oracle SQL (columns sorted by name,
rows in emitted order, exact value equality — same as a hash compare).
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Normalize a cell for comparison.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date; ns vs us normalize via str
        return v.isoformat()
    if isinstance(v, bytes):
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(data[j][i]) for j in range(len(cols)))
                  for i in range(tbl.num_rows)]


def type_tag(t):
    # Normalize an arrow type to the granularity the driver's hash cares
    # about, calibrated against CORRECTNESS_r03 evidence: integer widths
    # (int32 rank vs int64) and small decimals vs double (q_map_funs)
    # hash-passed, so they are benign; DuckDB HUGEINT — decimal128(38,0) —
    # vs Spark int64 is exactly the silent hash-mismatch class
    # (q_json_props, r3) and must FAIL.
    import pyarrow as pa
    s = str(t)
    if s == "decimal128(38, 0)":
        return "hugeint"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("date"):
        return "date"
    if s in ("string", "large_string"):
        return "string"
    return s


def type_hazards(name, got, exp):
    # Returns a list of FAIL strings for dtype-level hazards the value
    # compare cannot see (the driver hashes dtypes implicitly and its
    # pandas sort crashes outright on LIST/STRUCT columns).
    errs = []
    gt = {c: got.schema.field(c).type for c in got.column_names}
    et = {c: exp.schema.field(c).type for c in exp.column_names}
    for c in sorted(set(gt) & set(et)):
        import pyarrow as pa
        for side, t in (("spark", gt[c]), ("duck", et[c])):
            if pa.types.is_nested(t):
                errs.append(f"{name}: col {c} is nested ({side}={t}) — "
                            "driver comparator crashes on LIST/STRUCT")
        if type_tag(gt[c]) != type_tag(et[c]):
            errs.append(f"{name}: col {c} dtype spark={gt[c]} duck={et[c]}")
    return errs


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        except Exception as e:  # missing table: skip, queries on it will FAIL
            print(f"warn: view {t}: {str(e)[:120]}")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    rows_only = []
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_bad += 1
            continue
        got = pq.read_table(files[0])
        if name not in oracle:
            rows_only.append((name, got.num_rows))
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_bad += 1
            continue
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        if gc != ec:
            print(f"FAIL  {name}: columns differ spark={gc} duck={ec}")
            n_bad += 1
            continue
        hz = type_hazards(name, got, exp)
        if hz:
            for h in hz:
                print(f"FAIL  {h}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL  {name}: rows differ spark={len(gr)} duck={len(er)}")
            n_bad += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            # pinpoint the first differing column
            for j, cn in enumerate(gc):
                if a[j] != b[j]:
                    print(f"FAIL  {name}: row {i} col {cn}: "
                          f"spark={a[j]!r} duck={b[j]!r}")
                    break
            n_bad += 1
        else:
            print(f"ok    {name} ({len(gr)} rows)")
            n_ok += 1
    for name, n in rows_only:
        status = "ok" if n > 0 else "WARN(0 rows)"
        print(f"rows  {name}: {n} rows [{status}] (no oracle)")
    missing = set(oracle) - set(os.listdir(out))
    for name in sorted(missing):
        print(f"FAIL  {name}: oracle declared but no spark output dir")
        n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(rows_only)} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
