"""Targeted oracle rehearsal: like rehearse_oracles.py but only for the
query names given on the command line — the round-6 optimization loop's
fast equivalence check after restructuring a query's plan.

Usage: python jobs/rehearse_some.py <query> [<query> ...] [--sf DIR]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from origami_spark.oracle_compare import canon as _canon  # noqa: E402
from origami_spark.oracle_compare import duck_connect  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]

    from origami_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("rehearse_some")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    con = duck_connect(sf_dir)
    fails = []
    t0 = time.time()
    for name in args:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            sql = oracles.get(name)
            if sql is None:
                status = f"rows-only({len(sdf)})"
            else:
                ddf = con.execute(sql).df()
                sc, sr = _canon(sdf)
                dc, dr = _canon(ddf)
                if sc == dc and sr == dr:
                    status = f"OK({len(sdf)})"
                else:
                    fails.append(name)
                    status = (f"MISMATCH rows {len(sr)} vs {len(dr)} "
                              f"cols {sc} vs {dc}")
        except Exception as e:
            fails.append(name)
            status = "ERROR " + repr(e)[:200]
        print("%-32s %s" % (name, status), flush=True)
    print(json.dumps({"wall_s": round(time.time() - t0, 1), "fails": fails}))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
