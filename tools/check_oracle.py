#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out]
Runs each oracle_sql.json query in DuckDB against the raw lake tables and
compares (sorted columns, sorted rows, exact values) with the Spark parquet
output written by graft.Verify.
"""
import sys, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

sqls = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(sqls.items()):
    try:
        o = con.execute(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE-ERROR {e}')
        fails.append(name)
        continue
    try:
        s = duckdb.query(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        print(f'{name}: SPARK-OUT-ERROR {e}')
        fails.append(name)
        continue
    o = o[sorted(o.columns)]
    s = s[sorted(s.columns)]
    if list(o.columns) != list(s.columns):
        print(f'{name}: SCHEMA-MISMATCH oracle={list(o.columns)} spark={list(s.columns)}')
        fails.append(name)
        continue
    # TYPE-STRICT gate (decimal precision/scale included): the driver's
    # value hash is type-sensitive, while the pandas compare below erases
    # precision — r14 shipped a DECIMAL(28,6)-vs-DECIMAL(18,6) fail that
    # this sweep called MATCH. Compare duckdb-described types first.
    try:
        ot = dict(r[:2] for r in con.execute(f'DESCRIBE {sql}').fetchall())
        st = dict(r[:2] for r in duckdb.query(
            f"DESCRIBE SELECT * FROM '{out}/{name}/*.parquet'").fetchall())
        delta = [(c, ot[c], st[c]) for c in sorted(o.columns) if ot[c] != st[c]]
        if delta:
            print(f'{name}: TYPE-MISMATCH ' + '; '.join(
                f'{c}: oracle={a} spark={b}' for c, a, b in delta))
            fails.append(name)
            continue
    except Exception as e:
        print(f'{name}: TYPE-DESCRIBE-ERROR {e}')
        fails.append(name)
        continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    if len(o) != len(s):
        print(f'{name}: ROWS-MISMATCH oracle={len(o)} spark={len(s)}')
        fails.append(name)
        continue
    # exact-value compare, dtype-insensitive-ish (both through pandas)
    try:
        ok = o.equals(s)
        if not ok:
            # locate first differing cell for diagnostics
            diff = (o != s) & ~(o.isna() & s.isna())
            cells = diff.to_numpy().nonzero()
            r, c = cells[0][0], cells[1][0]
            print(f'{name}: VALUE-MISMATCH first at row {r} col {o.columns[c]}: '
                  f'oracle={o.iloc[r, c]!r} spark={s.iloc[r, c]!r} (rows={len(o)})')
            fails.append(name)
            continue
    except Exception as e:
        print(f'{name}: COMPARE-ERROR {e}')
        fails.append(name)
        continue
    print(f'{name}: MATCH ({len(o)} rows)')

rows_only = [d.split('/')[-1] for d in glob.glob(f'{out}/*') if
             d.split('/')[-1] not in sqls and not d.endswith('.json')]
for name in sorted(rows_only):
    n = duckdb.query(f"SELECT count(*) FROM '{out}/{name}/*.parquet'").fetchone()[0]
    print(f'{name}: ROWS-ONLY ({n} rows)' + ('  ⚠ EMPTY' if n == 0 else ''))

print(f'\n{len(sqls) - len(fails)}/{len(sqls)} oracle queries match; {len(fails)} fail: {fails}')
sys.exit(1 if fails else 0)
