"""Local oracle-parity harness — mimics the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixture, then compares row count, schema (column names), dtype
kinds STRICTLY (no int/float coercion — the round-1 float-coercion leniency
shipped 6 driver reds as local greens), and order-insensitive values EXACTLY
(bit-equal floats). It also audits the oracle's DuckDB output types and fails
on HUGEINT columns (sum() over integers), because pandas coerces those to
float64 before any value comparison can see the divergence while the driver's
value hash does distinguish them from Spark's BIGINT.

Usage:
    python tools/parity.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from usw_big_data_analysis_spark.session import get_spark  # noqa: E402
from usw_big_data_analysis_spark.sources.tables import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table = a parquet DIRECTORY (the scaled-parity
            # fixtures, tools/parity_at_scale.py); glob its part files
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def oracle_type_problems(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """DuckDB-level output-type audit for an oracle. HUGEINT (int128) is the
    type the driver's value hash distinguishes from Spark's BIGINT — DuckDB
    returns it for every sum() over integer arguments, and pandas fetchdf
    silently coerces it to float64, which is why a value-level comparison
    alone cannot see it (the round-1 postmortem). Flag it at the source."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"ORACLE-TYPE {col}: {typ} (wrap the aggregate in CAST(... AS BIGINT))"
        for col, typ, *_ in desc
        if "HUGEINT" in typ.upper()
    ]


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"SCHEMA cols spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"ROWS spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        # STRICT dtype-kind equality: int-vs-float coercion masked the
        # HUGEINT divergence in round 1 (6 driver reds shipped as local
        # greens). The only tolerated mix is unsigned-vs-signed ints.
        if sk != dk and {sk, dk} != {"i", "u"}:
            problems.append(f"DTYPE {c}: spark={s[c].dtype} duck={d[c].dtype}")
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sk in "fc" or dk in "fc":
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
        else:
            eq = sv == dv
        if not np.all(eq):
            bad = np.nonzero(~eq)[0][:3]
            ex = [(c, int(i), sv[i], dv[i]) for i in bad]
            problems.append(f"VALUES {c}: {int((~eq).sum())}/{len(eq)} differ, e.g. {ex}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--json",
        default=None,
        metavar="PATH",
        help="also write a per-key result artifact (e.g. PARITY_SF01_r05.json "
        "— the recorded full-registry sweep, VERDICT r4 #7)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    spark = get_spark("parity")
    con = duck_con(args.sf_dir)

    n_pass = n_fail = n_err = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"ERROR {name} (spark):\n{traceback.format_exc()}")
            n_err += 1
            results[name] = {"status": "error", "side": "spark"}
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            results[name] = {"status": "rows_only", "rows": len(spdf)}
            continue
        try:
            type_problems = oracle_type_problems(con, oracles[name])
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"ERROR {name} (duckdb):\n{traceback.format_exc()}")
            n_err += 1
            results[name] = {"status": "error", "side": "duckdb"}
            continue
        problems = type_problems + compare(name, spdf, dpdf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
            results[name] = {"status": "fail", "problems": problems}
        else:
            print(f"ok   {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
            results[name] = {"status": "ok", "rows": len(spdf)}
    print(f"\n== {n_pass} ok, {n_fail} fail, {n_err} error, {n_rows_only} rows-only ==")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    # a subsetted run must be distinguishable from a
                    # full-registry attestation (code-review r5)
                    "full_sweep": only is None,
                    "only": sorted(only) if only else None,
                    "summary": {
                        "ok": n_pass,
                        "fail": n_fail,
                        "error": n_err,
                        "rows_only": n_rows_only,
                    },
                    "results": results,
                },
                fh,
                indent=1,
            )
    spark.stop()
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
