#!/usr/bin/env python3
"""DuckDB oracle compare for a graft Verify dump — the committed form
of the scale-sweep check (invoked by `sbt "runMain graft.VerifyAtSf"`,
also runnable by hand):

    python3 scripts/oracle_compare.py <sfDir> <verifyOutDir> <reportJson>

Replicates the driver's compare exactly: columns sorted BY NAME,
values rounded to 6 places, rendered as strings, rows sorted, md5 over
the whole frame. Entries without an oracle are reported (the driver
covers them with structural row checks inside Verify itself). Exits
nonzero on any rows/hash mismatch or per-entry error."""
import sys, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    h = hashlib.md5(
        str(sorted(df.round(6).astype(str).values.tolist())).encode()
    ).hexdigest()
    return h, len(df)


def main(sf_dir, out_dir, report_path):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results, mismatches, errors = {}, [], []
    for name in sorted(sql):
        try:
            oracle = con.execute(sql[name]).fetchdf()
            mine = pd.read_parquet(f"{out_dir}/{name}")
            ho, no = norm(oracle)
            hm, nm = norm(mine)
            ok = ho == hm and no == nm
            results[name] = {"rows_oracle": no, "rows_engine": nm,
                             "hash_match": ok}
            if not ok:
                mismatches.append(name)
            print(f"{name:34s} rows {no:>8d} {nm:>8d} match: {ok}")
        except Exception as e:  # noqa: BLE001 - report, don't die mid-sweep
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            errors.append(name)
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
    import os
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    report = {
        "sf_dir": sf_dir,
        "entries_checked": len(sql),
        "matches": len(sql) - len(mismatches) - len(errors),
        "mismatches": sorted(mismatches),
        "errors": sorted(errors),
        # dumped but oracle-less: covered by Verify's structural row
        # checks, listed here so the sweep's coverage is explicit
        "no_oracle": sorted(dumped - set(sql)),
        "per_entry": results,
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"\n[scale-sweep] {report['matches']}/{len(sql)} oracle matches; "
          f"{len(mismatches)} mismatches, {len(errors)} errors -> {report_path}")
    return 1 if (mismatches or errors) else 0


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    sys.exit(main(*sys.argv[1:4]))
