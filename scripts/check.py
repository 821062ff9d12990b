#!/usr/bin/env python3
"""Self-check harness mimicking the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the
same parquet tables, loads the Spark parquet result, and compares as
sorted multisets of rows (columns sorted by name). Exact compare —
the same bar as a hash match.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for comparison
    def canon(v):
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            try:
                return tuple(canon(x) for x in v.tolist())
            except TypeError:
                return v.tolist()
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return v
    return df.apply(lambda col: col.map(canon))


def rows(df: pd.DataFrame):
    return sorted(map(repr, df.to_records(index=False).tolist()))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    result_dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = [d.rstrip("/").split("/")[-1] for d in result_dirs]
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in
                 sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        if name not in oracle:
            status = "rows>0" if len(spark_df) > 0 else "EMPTY"
            tag = "ok  " if len(spark_df) > 0 else "FAIL"
            if len(spark_df) == 0:
                failures += 1
            print(f"{tag} {name}: no oracle ({status}, {len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # The driver's comparator cannot hash array-typed cells (round-1
        # q14 'unhashable numpy.ndarray'); flag them as failures here so
        # the self-check predicts the real gate.
        arrayish = [c for c in spark_df.columns if spark_df[c].map(
            lambda v: isinstance(v, (list, tuple)) or
            (hasattr(v, "tolist") and not isinstance(v, (str, bytes)))).any()]
        if arrayish:
            print(f"FAIL {name}: array-typed columns {arrayish} unsupported "
                  "by the driver comparator — emit a joined string instead")
            failures += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL {name}: columns {sorted(a.columns)} vs {sorted(b.columns)}")
            failures += 1
            continue
        ra, rb = rows(a), rows(b)
        if len(ra) != len(rb):
            print(f"FAIL {name}: rowcount {len(ra)} vs {len(rb)}")
            failures += 1
        elif ra != rb:
            bad = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"  spark: {ra[i]}\n  duck:  {rb[i]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(ra)} rows match")
    missing = set(oracle) - set(names)
    if missing:
        print(f"FAIL missing spark results for: {sorted(missing)}")
        failures += 1
    print(f"\n{len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
