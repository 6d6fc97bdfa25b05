"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, an order-insensitive value digest, AND the pandas dtype *kind*
of every column.

The dtype check is the round-6 addition: rounds 3-5 each "fixed" an
entry locally and still hash-failed at the driver because the old
``fetchall()`` comparison saw Python ints where the driver's pandas
conversion saw float64 (DuckDB HUGEINT sums) or object Decimal (Spark
decimal outputs). Both engines now go through pandas (Spark
``toPandas()``, DuckDB ``.df()``) exactly like the driver, and a column
whose *kind* differs (int vs float vs decimal vs str ...) FAILS even
when the values match — that is precisely the class of edge the driver
sees and we used to miss.

Value comparison stays tolerant (decimals compare as floats, dates as
ISO strings) so the output distinguishes "type-representation edge"
(DTYPE line, values equal) from a real value bug (hash line).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _col_kind(s: pd.Series) -> str:
    """Coarse dtype kind for cross-engine comparison.

    date and datetime collapse to one kind (Spark DateType arrives as
    object-of-date, DuckDB DATE as datetime64 — the driver normalizes
    these fine, so we don't flag them), but int / float / decimal / str
    stay distinct: int64-vs-float64 (HUGEINT widening) and
    Decimal-vs-float64 (engine-default DECIMAL widths) are the exact
    asymmetries behind the r3-r5 driver-only hash-fails.
    """
    dt = s.dtype
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    nn = s.dropna()
    if len(nn):
        v = nn.iloc[0]
        if isinstance(v, (datetime.datetime, pd.Timestamp, datetime.date)):
            return "datetime"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, str):
            return "str"
    return "object"


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, (float,)):
        if math.isnan(v):
            return "NULL"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NULL"
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def digest(df: pd.DataFrame):
    cols = sorted(df.columns)
    cells = {c: [_norm_cell(v) for v in df[c].tolist()] for c in cols}
    lines = sorted(
        "|".join(cells[c][i] for c in cols) for i in range(len(df))
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main() -> int:
    # Deliberately NOT etl_workflow_spark.session.get_spark: the driver's
    # harness builds its own mostly-default session (ANSI on, no legacy
    # parquet confs, host timezone), so gate entries must be
    # session-agnostic. Local gating on a default session is what keeps
    # that true (round-1 lesson: 5 entries passed here with our factory
    # configs and errored in the driver).
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.appName("check")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"okay {name}: rows-only check, {len(sdf)} rows "
                f"({time.time()-t0:.1f}s)"
            )
            if not len(sdf):
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
            ok = False
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: cols spark={sorted(sdf.columns)} "
                f"duckdb={sorted(odf.columns)}"
            )
            ok = False
        if ok:
            for c in sorted(sdf.columns):
                sk, okind = _col_kind(sdf[c]), _col_kind(odf[c])
                if sk != okind:
                    print(
                        f"FAIL {name}: DTYPE {c}: spark={sk}"
                        f"({sdf[c].dtype}) duckdb={okind}({odf[c].dtype})"
                    )
                    ok = False
        if ok:
            sh, sl = digest(sdf)
            oh, ol = digest(odf)
            if sh != oh:
                ok = False
                print(f"FAIL {name}: value hash mismatch")
                for a, b in zip(sl, ol):
                    if a != b:
                        print(f"  spark : {a}\n  duckdb: {b}")
                        break
        if ok:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    # Cache-hygiene gate: after the full sweep, no entry may leave an
    # explicit persist behind (localCheckpoint residue is reclaimed by
    # GC and exempt) — the leak class that held two r7 components weak.
    leaked = []
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        rdd = it.next().getValue().rdd()
        if not rdd.isLocallyCheckpointed():
            leaked.append(rdd.id())
    if leaked:
        failures.append(f"persist-leak:{leaked}")
        print(f"FAIL persist-leak: {len(leaked)} cached RDDs left behind")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
