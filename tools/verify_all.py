"""One-command driver-contract verification: pytest + oracle sweep +
vanilla-session driver simulation (the /verify recipe, sequenced).

Usage: python tools/verify_all.py [sf_dir]
Exit code 0 iff all three gates pass."""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = r'''
import sys, os
sys.path.insert(0, %(root)r)
os.chdir(%(root)r)
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
import __spark_entry__ as E
assert len(E.entry(spark).collect()) >= 0
import duckdb
con = duckdb.connect()
SF = %(sf)r
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
qs, os_ = E.queries(), E.oracle_sql()
def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.astype(str).sort_values(list(pdf.columns)).reset_index(drop=True)
bad = []
for name, fn in qs.items():
    try:
        got = fn(spark, SF).toPandas()
        if name in os_:
            want = con.execute(os_[name]).df()
            a, b = canon(got), canon(want)
            if not (list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)):
                bad.append(name); print("MISMATCH", name, flush=True)
            else:
                print("PASS", name, flush=True)
        else:
            print("ROWS", name, len(got), flush=True)
    except Exception as e:
        bad.append(name); print("ERR", name, repr(e)[:160], flush=True)
print("BAD:", bad, flush=True)
sys.exit(1 if bad else 0)
'''


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    steps = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ("oracle sweep", [sys.executable, "tools/check_oracle.py", sf]),
        ("plan invariants", [sys.executable, "tools/plan_invariants.py", sf]),
        ("driver sim", [sys.executable, "-c", SIM % {"root": ROOT, "sf": sf}]),
    ]
    for name, cmd in steps:
        print(f"=== {name} ===", flush=True)
        rc = subprocess.call(cmd, cwd=ROOT)
        if rc != 0:
            print(f"FAILED at {name} (rc={rc})")
            return rc
    print("ALL GATES GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
