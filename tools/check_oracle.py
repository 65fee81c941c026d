"""Local replica of the driver's t2 correctness gate.

For every query in ``__spark_entry__.queries()``: run the Spark
DataFrame at a given sf dir AND the matching ``oracle_sql()`` in DuckDB
(tables pre-registered as views), then compare

  1. row count,
  2. column-name set,
  3. order-insensitive value hash (columns sorted by name, every cell
     canonicalized to a string, rows sorted, sha256).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
Exit 0 iff every checked query matches.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_signature(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


# --- driver-parity guard -------------------------------------------------
# The DRIVER canonicalizes both sides through pandas; this gate hashes the
# raw python objects (fetchall/collect). The one way those disagree is the
# numeric family: DuckDB HUGEINT (any un-cast SUM over integers) and DECIMAL
# land in pandas as float64 and render "123.0", while Spark's int64 renders
# "123" — hash_match false at the driver even though the values are equal
# here. Round 1 shipped 8 red queries exactly this way, so flag any column
# whose numeric family differs between the Spark schema and DuckDB's types.

_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def _num_family_mismatches(sdf, ocols, otypes) -> list[str]:
    spark_kind = {}
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if t in _SPARK_INT:
            spark_kind[f.name] = "i"
        elif t in _SPARK_FLOAT or t.startswith("decimal"):
            spark_kind[f.name] = "f"
    bad = []
    for c, ot in zip(ocols, otypes):
        ot = str(ot)
        if ot == "HUGEINT":
            bad.append(f"{c}: DuckDB HUGEINT (un-cast integer SUM?) -> "
                       "pandas float64 at the driver; CAST(... AS BIGINT)")
            continue
        ok = ("i" if ot in _DUCK_INT
              else "f" if ot in ("FLOAT", "DOUBLE") or ot.startswith("DECIMAL")
              else None)
        sk = spark_kind.get(c)
        if sk and ok and sk != ok:
            bad.append(f"{c}: spark {sk!r} vs duckdb {ot} -> driver hash divergence")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures, checked, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = list(orel.columns)
            otypes = list(orel.types)
            orows = orel.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        s_sig = frame_signature([c for c in scols], [tuple(r) for r in srows])
        o_sig = frame_signature(ocols, orows)
        checked += 1
        family_bad = _num_family_mismatches(sdf, ocols, otypes)
        if family_bad:
            failures.append((name, "; ".join(family_bad)))
            print(f"FAIL  {name}: driver-parity type mismatch")
            for msg in family_bad:
                print(f"  {msg}")
            continue
        if s_sig == o_sig:
            print(f"OK    {name}: {s_sig[0]} rows, hash {s_sig[2]} [{time.time()-t0:.1f}s]")
        else:
            failures.append((name, f"spark={s_sig} oracle={o_sig}"))
            print(f"FAIL  {name}:\n  spark : {s_sig}\n  oracle: {o_sig}")
            if s_sig[0] == o_sig[0] and s_sig[1] == o_sig[1]:
                # same shape — show first differing canonical rows
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sc = sorted("|".join(_canon_cell(r[i]) for i in order) for r in [tuple(r) for r in srows])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oc = sorted("|".join(_canon_cell(r[i]) for i in oo) for r in orows)
                for a, b in zip(sc, oc):
                    if a != b:
                        print(f"  spark row : {a}\n  oracle row: {b}")
                        break
    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
