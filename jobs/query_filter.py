"""spark-submit entry: probe a built filter against a key column.

    spark-submit --py-files cuckoofilter_spark.zip jobs/query_filter.py \
        --filter /ckpt/tokens_cf/filter.bin \
        --probes /data/candidates.parquet --col token \
        --out /data/members.parquet [--invert]

Broadcasts the filter once per executor; probing is a vectorized pandas
UDF.  --invert keeps definite non-members (the no-false-drop direction).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/query_filter.py` runs: repo root on path (under
# spark-submit, --py-files provides the package instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--filter", required=True, help="path to filter.bin")
    ap.add_argument("--probes", required=True, help="parquet of probe keys")
    ap.add_argument("--col", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--invert", action="store_true")
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])

    from cuckoofilter_spark.operators.checkpointed_build import CheckpointedBuild
    from cuckoofilter_spark.operators.membership import membership_df
    from cuckoofilter_spark.session import get_spark

    spark = get_spark("cf-query")
    filt = CheckpointedBuild.load_final(args.filter)
    probes = spark.read.parquet(args.probes)
    t0 = time.time()
    out = membership_df(spark, filt, probes, args.col, keep=not args.invert)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows_out": n, "sec": round(time.time() - t0, 3),
                      "out": args.out}))


if __name__ == "__main__":
    main()
