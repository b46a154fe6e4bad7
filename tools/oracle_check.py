"""Local replica of the driver's t2 correctness gate.

Runs each ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin
(DuckDB over the same parquet), compares row count + column names +
order-insensitive values, and prints a per-query verdict. Use::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR_DEFAULT = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # order-insensitive: sort by every column
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def canon(v) -> str:
    """Canonical dtype-faithful string for one cell.

    The driver's gate hashes values after sorting columns by name; an int64
    column and a float64 column holding 'equal' numbers format differently
    (123 vs 123.0) and hash-mismatch. So canonicalize per-VALUE-TYPE, never
    coercing int to float: a DuckDB HUGEINT SUM fetched as float64 must FAIL
    here the same way it fails the driver (ADVICE r01, item 3)."""
    if v is None:
        return "<NULL>"
    if hasattr(v, "item"):  # numpy scalar → python first (repr(np.float64) differs)
        try:
            v = v.item()
        except (ValueError, TypeError):
            pass
    if isinstance(v, float):
        if v != v:  # NaN
            return "<NULL>"
        return repr(v)  # 123.0 stays distinct from int 123
    # Dates: spark toPandas gives datetime.date objects, duckdb fetchdf gives
    # datetime64[us] at midnight — the DRIVER's hash treats these as equal
    # (r01: p_type_coercion/f_dates/f_date_explode all hash_match=true), so
    # canonicalize midnight timestamps down to the date form.
    import datetime as _dt

    if v is pd.NaT:  # NaT subclasses datetime but .time() raises
        return "<NULL>"
    if isinstance(v, pd.Timestamp):
        if v != v:
            return "<NULL>"
        if v == v.normalize():
            return str(v.date())
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        if v.time() == _dt.time(0, 0):
            return str(v.date())
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass  # arrays/lists: not scalar-na-checkable
    return str(v)


def compare(name: str, sdf_pd: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf_pd) != len(odf):
        problems.append(f"rowcount spark={len(sdf_pd)} oracle={len(odf)}")
    scols, ocols = sorted(sdf_pd.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns spark={scols} oracle={ocols}")
        return problems
    a, b = normalize(sdf_pd), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            av = a[c].map(canon)
            bv = b[c].map(canon)
            neq = av != bv
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs "
                    f"(spark dtype={a[c].dtype}, oracle dtype={b[c].dtype}), "
                    f"first@{i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR_DEFAULT
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from good_enough_timecamp_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle_check")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duck_con(sf_dir)

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only, {len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"OK    {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
