"""Drive the full driver contract: every queries() entry vs its
oracle_sql() in DuckDB at sf0.01, order-insensitive value hash.
Run from a FOREIGN cwd (e.g. /tmp). Writes a JSON summary to the path
in argv[1] (default /tmp/drive_verify.json).

Optional: --only name1,name2 drives a subset (fast iteration).
"""

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from minimapreduce_spark.session import get_spark  # noqa: E402


def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return hashlib.sha256(
        "\n".join(
            sorted(",".join(repr(v) for v in r) for r in pdf.itertuples(index=False))
        ).encode()
    ).hexdigest()[:12]


def main() -> None:
    out_path = "/tmp/drive_verify.json"
    only = None
    args = sys.argv[1:]
    if args and not args[0].startswith("--"):
        out_path = args.pop(0)
    if args and args[0] == "--only":
        only = set(args[1].split(","))

    spark = get_spark(app_name="drive", master="local[8]", shuffle_partitions=8)
    df = e.entry(spark)
    n = len(df.collect())
    assert n > 0, "entry() returned no rows"
    print("ENTRY-OK", n, df.schema.simpleString(), flush=True)

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracles = e.oracle_sql()
    results: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t1 = time.time()
        try:
            spdf = fn(spark, sf).toPandas()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {"status": "ROWS-ONLY", "rows": len(spdf)}
                print("ROWS-ONLY", name, len(spdf), flush=True)
                continue
            opdf = con.execute(sql).df()
            ok = (
                value_hash(spdf) == value_hash(opdf)
                and len(spdf) == len(opdf)
                and sorted(spdf.columns) == sorted(opdf.columns)
            )
            results[name] = {
                "status": "MATCH" if ok else "MISMATCH",
                "rows": len(spdf),
                "oracle_rows": len(opdf),
                "sec": round(time.time() - t1, 2),
            }
            print(results[name]["status"], name, len(spdf),
                  f"{results[name]['sec']}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — record and keep driving
            results[name] = {"status": "ERROR", "err": f"{type(ex).__name__}: {ex}"}
            print("ERROR", name, results[name]["err"][:200], flush=True)

    bad = {k: v for k, v in results.items() if v["status"] in ("MISMATCH", "ERROR")}
    summary = {
        "total": len(results),
        "bad": bad,
        "rows_only": [k for k, v in results.items() if v["status"] == "ROWS-ONLY"],
        "wall_sec": round(time.time() - t0, 1),
    }
    json.dump({"summary": summary, "results": results}, open(out_path, "w"), indent=1)
    print("DONE", json.dumps(summary["bad"]) if bad else "ALL-GREEN",
          len(results), "queries", summary["wall_sec"], "s", flush=True)


if __name__ == "__main__":
    main()
