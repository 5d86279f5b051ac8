#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (sorted) against the Spark
result parquet written by graft.Verify. Usage:
  python3 tools/local_verify.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if getattr(df[c].dt, 'tz', None) else pd.to_datetime(df[c])
        elif df[c].dtype == object and len(df) and isinstance(df[c].dropna().iloc[0] if df[c].dropna().size else None, (datetime.date, datetime.datetime)):
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Large-scale compares (sf10: 500k-doc corpora) can push a single
    # oracle's intermediates past DuckDB's default 80%-of-RAM limit and
    # get the whole process OOM-killed; cap it and let heavies spill.
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '40GB')}'")
    spill = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. ScaleUpMain)
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            # ScaleUpMain writes ts as raw INT64 nanos (the TIMESTAMP(NANOS)
            # workaround); give the oracles the same micros-truncated
            # timestamp Spark's read path produces
            # DESCRIBE works on empty tables too (typeof-on-a-row does not,
            # and skipping the shim for an empty BIGINT table would leave
            # every events oracle binder-erroring on the raw nanos column)
            kind = next(r[1] for r in con.execute("DESCRIBE events").fetchall()
                        if r[0] == "ts")
            if kind == "BIGINT":
                con.execute(f"""CREATE OR REPLACE VIEW events AS
                    SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
                    FROM {src}""")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}

    def record(name, v):
        # stream per-query verdicts so a long (or OOM-killed) run shows
        # progress and the offending oracle instead of ending silent
        results[name] = v
        print(f"[cmp] {name}: {v[:200]}", file=sys.stderr, flush=True)

    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                             ignore_index=True)
        if name not in oracle:
            record(name, f"NO-ORACLE rows={len(spark_df)}" + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            record(name, f"ORACLE-ERROR {e}")
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            record(name, f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            continue
        if len(a) != len(b):
            record(name, f"ROWCOUNT spark={len(a)} duck={len(b)}")
            continue
        # Driver hashes stringified values, so a float-vs-int column (900.0 vs
        # 900) hash-mismatches even when numerically equal. Flag any dtype-KIND
        # divergence (int/float/object/datetime/bool); width-only differences
        # (int32 vs int64) stringify identically and are allowed.
        kinds = [(c, a[c].dtype.kind, b[c].dtype.kind) for c in a.columns
                 if a[c].dtype.kind != b[c].dtype.kind]
        if kinds:
            record(name, f"DTYPE-KIND-MISMATCH {kinds}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            record(name, f"OK rows={len(a)}")
        except AssertionError as e:
            msg = str(e).split("\n")
            results[name] = "VALUE-MISMATCH " + " | ".join(msg[:3])
            # show first differing rows
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                results[name] += f" row{i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
    nok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith("OK") or v.startswith("NO-ORACLE") else "XX"
        print(f"{flag} {k}: {v[:400]}")
    print(f"\n{nok}/{len([k for k in results if k in oracle])} oracled queries OK; "
          f"{len(results)-len([k for k in results if k in oracle])} rows-only")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
