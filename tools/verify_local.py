#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §5).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/verify_local.py <sfDir> <outDir>

For each query parquet in <outDir> it runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet),
canonicalizes both sides (columns sorted by name, rows sorted), and
compares cell-by-cell. Floats are compared exactly first; if not exact,
reports the max abs diff so precision hedges can be tuned.
"""
import datetime
import json, math, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class for the STRICT schema gate, mirroring the
    driver's compare: a tz-aware timestamp vs a naive one is a schema
    FAIL (this is exactly how the round-6/7 dump-ts regressions slipped
    past the old, lenient version of this tool), as is int vs float
    (DuckDB HUGEINT/float oracle vs Spark BIGINT)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts-aware" if getattr(s.dtype, "tz", None) is not None else "ts-naive"
    if s.dtype == object:
        v = s.dropna()
        # ALL non-null values must be pure dates (not a first-row
        # sample: a mixed date/datetime column or one classified off a
        # single value could slip the strict gate — round-8 advice)
        if len(v) and all(isinstance(x, datetime.date)
                          and not isinstance(x, datetime.datetime)
                          for x in v):
            # parquet DATE reads as python date objects; the driver
            # compares DATE vs naive-TIMESTAMP as equal (srt_multikey
            # r06: all-true with a DATE dump vs timestamp oracle)
            return "ts-naive"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, tz-naive
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            if dtype_class(df[c]) == "ts-naive":
                # python date objects → naive midnight timestamps, so
                # DATE-vs-TIMESTAMP value compare matches the driver
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)) \
             .reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    # STRICT dtype-class gate BEFORE the value-normalizing canon: the
    # driver fails schema on naive-vs-aware and int-vs-float even when
    # every value matches, so this tool must too.
    sa = {c: dtype_class(spark_df[c]) for c in sorted(spark_df.columns)}
    sb = {c: dtype_class(oracle_df[c]) for c in sorted(oracle_df.columns)}
    if set(sa) == set(sb):
        bad = {c: (sa[c], sb[c]) for c in sa if sa[c] != sb[c]}
        if bad:
            return f"SCHEMA dtype-class mismatch (spark,oracle): {bad}"
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} oracle={len(b)}"
    worst = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            # one-sided NULL/NaN is a VALUE mismatch, not a float diff:
            # np.nanmax would silently ignore it (and an all-NaN diff
            # column passes the worst>0 check) — exactly the blind spot
            # that would hide a NULL-guard disagreement between engines
            a_nan, b_nan = np.isnan(af), np.isnan(bf)
            if np.any(a_nan != b_nan):
                i = int(np.argmax(a_nan != b_nan))
                return (f"VALUE mismatch col={c} row={i}: "
                        f"spark={af[i]!r} oracle={bf[i]!r} (one-sided null)")
            both_nan = a_nan & b_nan
            diff = np.abs(af - bf)
            diff[both_nan] = 0.0
            if np.any(diff != 0.0):
                worst = max(worst, float(np.nanmax(diff)))
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return (f"VALUE mismatch col={c} row={i}: "
                        f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    if worst > 0.0:
        return f"FLOAT diff (max abs {worst:.3e})" + (" [FAIL]" if worst > 1e-9 else " [ok-ish]")
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    results = {}
    dirs = {os.path.basename(d.rstrip("/")): d
            for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracles) | set(dirs)):
        d = dirs.get(name)
        if d is None:
            print(f"  {name}: MISSING OUTPUT"); n_fail += 1; continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows) "
                  + ("PASS" if len(spark_df) > 0 else "FAIL"))
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        err = compare(name, spark_df, oracle_df)
        if err is None or "[ok-ish]" in str(err):
            extra = f" ({err})" if err else ""
            print(f"  {name}: PASS ({len(spark_df)} rows){extra}")
            n_pass += 1
        else:
            print(f"  {name}: FAIL — {err}")
            n_fail += 1
        results[name] = err
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
