#!/usr/bin/env python3
"""Re-materialize a single-file testdata SF dir as N-file parquet dirs.

Driver-side harness tooling (like check.py): production corpora are never
one file, and a single-file local table gives every scan exactly one input
partition — the r8 harness lesson (an AQE broadcast-collapse serialized a
stress join onto one spilling task). This tool builds the multi-file
fixture shape so the gate/bench can be run against it as evidence that no
plan or spec depends on the one-file accident.

pyarrow preserves every physical type EXACTLY (including events.parquet's
TIMESTAMP(NANOS), which a Spark rewrite would coerce), so the copy differs
from the driver fixture only in file count.

Usage: python3 tools/mkmultifile.py <srcSfDir> <dstSfDir> [nFiles=8]
"""
import os, sys
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(src, dst, n=8):
    for t in TABLES:
        sp = f"{src}/{t}.parquet"
        if not os.path.exists(sp):
            continue
        tab = pq.read_table(sp)
        out = f"{dst}/{t}.parquet"
        os.makedirs(out, exist_ok=True)
        rows = tab.num_rows
        k = min(n, max(rows, 1))
        step = (rows + k - 1) // k if rows else 1
        for i in range(k):
            sl = tab.slice(i * step, step)
            if sl.num_rows == 0 and rows > 0:
                break
            pq.write_table(sl, f"{out}/part-{i:05d}.parquet")
        print(f"{t}: {rows} rows -> {min(k, (rows + step - 1)//step if rows else 1)} files")

if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(src, dst, n)
