#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify
first (writes <out>/<query>/ parquet + oracle_sql.json), then this
script replays each oracle SQL in DuckDB over the same testdata
parquet tables and diffs values column-by-column.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOut>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        try:
            got = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_bad += 1
            continue
        wcols = sorted(want.column_names)
        gcols = sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
            n_bad += 1
            continue
        wrows = [[norm(r[c]) for c in wcols] for r in want.to_pylist()]
        grows = [[norm(r[c]) for c in wcols] for r in got.to_pylist()]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(wrows)}")
            n_bad += 1
            continue
        # schema type check (loose): report diffs
        wtypes = {f.name: str(f.type) for f in want.schema}
        gtypes = {f.name: str(f.type) for f in got.schema}
        tdiff = {c: (gtypes[c], wtypes[c]) for c in wcols if gtypes[c] != wtypes[c]}
        bad = None
        for i, (wr, gr) in enumerate(zip(wrows, grows)):
            if wr != gr:
                bad = (i, gr, wr)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_bad += 1
        else:
            extra = f" (type diffs: {tdiff})" if tdiff else ""
            print(f"OK   {name}: {len(wrows)} rows{extra}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(oracle)} total with oracle")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
