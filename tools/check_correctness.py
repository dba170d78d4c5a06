#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [name,name,...]

An optional third argument restricts the compare to a comma-separated
subset of query names (matching graft.Verify's subset argument), so a
fast single-query iteration does not report every undumped query as a
failure.

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same test tables,
and compares row sets (columns sorted by name, rows sorted, values
normalized). Exit code 1 on any mismatch.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Type-strict whitelist: the driver's hash is TYPE-sensitive (Arrow/pandas
# conversion), so a DuckDB result type that isn't the exact Spark parquet
# type is a failure even when every value matches — that is precisely how
# q18/q32 stayed driver-red for four rounds while value-green here (DuckDB
# widens sum(INTEGER) OVER (...) to HUGEINT). Rule (COVERAGE.md): every
# integer oracle output column must be explicitly CAST(... AS BIGINT);
# bare sum()/window-sum()/HUGEINT/DECIMAL/INTEGER outputs are errors.
DUCK_TO_ARROW = {
    "BIGINT": {"int64"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "BLOB": {"binary", "large_binary"},
}


def type_ok(duck_type, arrow_type):
    """True iff the DuckDB result type maps exactly onto the Arrow type."""
    d = duck_type.strip().upper()
    if d.endswith("[]"):
        import pyarrow as pa
        if not pa.types.is_list(arrow_type) and not pa.types.is_large_list(arrow_type):
            return False
        return type_ok(d[:-2], arrow_type.value_type)
    if d.startswith("TIMESTAMP"):
        return str(arrow_type).startswith("timestamp")
    allowed = DUCK_TO_ARROW.get(d)
    return allowed is not None and str(arrow_type) in allowed


def norm(v):
    if v is None:
        return None
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 but compare floats EXACTLY — the driver's
        # hash check is bit-strict, and the old round(_, 9) here is how a
        # locally-"green" q18/q32 shipped red in CORRECTNESS_r02. Queries
        # must produce identical doubles, not close ones.
        return 0.0 if v == 0 else v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cols, table):
    names = sorted(cols)
    idx = [cols.index(n) for n in names]
    out = []
    for row in table:
        out.append(tuple(norm(row[i]) for i in idx))
    return names, sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    if only is not None:
        # a misspelled subset name must not read as a green 0/0 gate
        for name in sorted(only - set(oracle)):
            print(f"FAIL {name}: not in oracle_sql.json (typo?)")
            failed.append(name)
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got_tbl = pq.read_table(f"{out_dir}/{name}")
            got_cols = got_tbl.column_names
            got_rows = [tuple(r.values()) for r in got_tbl.to_pylist()]
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: cannot read spark output: {e}")
            continue
        try:
            cur = con.execute(sql)
            exp_cols = [d[0] for d in cur.description]
            exp_rows = cur.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            duck_types = {d[0]: d[1] for d in desc}
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: DESCRIBE error: {e}")
            continue
        spark_types = {f.name: f.type for f in got_tbl.schema}
        type_bad = [
            (c, duck_types.get(c), spark_types.get(c))
            for c in sorted(set(duck_types) | set(spark_types))
            if c not in duck_types or c not in spark_types
            or not type_ok(duck_types[c], spark_types[c])
        ]
        if type_bad:
            failed.append(name)
            c, dt, st = type_bad[0]
            print(f"FAIL {name}: oracle TYPE mismatch ({len(type_bad)} cols); "
                  f"first: col={c} duckdb={dt} spark={st} "
                  f"(integer outputs must be CAST AS BIGINT)")
            continue
        gn, gr = rows_of(got_cols, got_rows)
        en, er = rows_of(exp_cols, exp_rows)
        if gn != en:
            failed.append(name)
            print(f"FAIL {name}: columns spark={gn} duckdb={en}")
            continue
        if len(gr) != len(er):
            failed.append(name)
            print(f"FAIL {name}: rowcount spark={len(gr)} duckdb={len(er)}")
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            failed.append(name)
            print(f"FAIL {name}: {len(bad)} differing rows; first: spark={bad[0][0]} duckdb={bad[0][1]}")
            continue
        print(f"PASS {name}: {len(gr)} rows, cols={gn}")
    n = len(oracle) if only is None else len(only)
    print(f"\n{n - len(failed)}/{n} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
