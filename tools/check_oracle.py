#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads our engine's dump from <outDir>/<name>/,
and compares: schema (column names), row count, and values (exact, after
sorting columns by name — mirroring the driver's described compare).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Oracle output columns must stay inside this set: anything else (HUGEINT
# from un-cast SUM(BIGINT)/window-SUM, DECIMAL from un-cast literals) can
# materialize differently in the driver's dump than in this client, which
# normalizes to python ints/floats and so can't see the divergence (the
# r2 a12/a13/a15/pack_sequences bug class). CAST the oracle column instead.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
              "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP_NS"}


def unsafe_cols(con, sql):
    """DESCRIBE the oracle SQL; return [(col, type)] outside SAFE_TYPES."""
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], row[1]
        base = typ.split("(")[0].strip().upper()
        if base not in SAFE_TYPES and not base.endswith("[]"):
            bad.append((col, typ))
    return bad


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame_key(cols, rows):
    """Sort columns by name; return list of row tuples (normalized)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        dump = Path(out_dir) / name
        if not dump.exists():
            print(f"FAIL {name}: no engine output")
            failures += 1
            continue
        try:
            bad = unsafe_cols(con, sql)
            if bad:
                print(f"FAIL {name}: oracle emits non-portable types {bad} — CAST them")
                failures += 1
                continue
            ours = con.execute(
                f"SELECT * FROM read_parquet('{dump}/*.parquet')"
            ).fetchall()
            our_cols = [d[0] for d in con.description]
            theirs_rel = con.execute(sql)
            their_cols = [d[0] for d in theirs_rel.description]
            theirs = theirs_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        if sorted(our_cols) != sorted(their_cols):
            print(f"FAIL {name}: schema {sorted(our_cols)} != {sorted(their_cols)}")
            failures += 1
            continue
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} != {len(theirs)}")
            failures += 1
            continue
        a, b = frame_key(our_cols, ours), frame_key(their_cols, theirs)
        if a == b:
            print(f"OK   {name} ({len(ours)} rows)")
        elif sorted(a) == sorted(b):
            print(f"WARN {name}: values match but ROW ORDER differs")
        else:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-checked queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
