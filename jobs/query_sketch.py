"""Query a sketch blob written by ``jobs/build_sketch.py``.

    python jobs/query_sketch.py --sketch-file /ckpt/users_hll.bin
    python jobs/query_sketch.py --sketch-file /ckpt/lat_kll.bin \
        --quantiles 0.5,0.9,0.99
    python jobs/query_sketch.py --sketch-file /ckpt/words_ss.bin \
        --keys the,and,of

The blob is self-describing (tag-byte wire format, ``sketches/base.py``) —
no type flag needed.  Answers are driver-local: a merged sketch is a few
KB–MB of state; querying it needs no cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sketch-file", required=True)
    ap.add_argument("--quantiles", default=None,
                    help="comma-separated q values (quantile sketches)")
    ap.add_argument("--keys", default=None,
                    help="comma-separated keys (count / top-k sketches); "
                         "integer keys are parsed as ints")
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])

    import numpy as np

    from cuckoofilter_spark.sketches.base import deserialize_sketch

    with open(args.sketch_file, "rb") as f:
        sk = deserialize_sketch(f.read())
    out: dict = {"sketch_type": type(sk).__name__}

    if args.quantiles:
        qs = [float(q) for q in args.quantiles.split(",")]
        vals = sk.quantile(np.array(qs))
        out["quantiles"] = {str(q): float(v) for q, v in zip(qs, np.atleast_1d(vals))}
    elif args.keys:
        keys = args.keys.split(",")
        ests = {}
        for k in keys:
            try:
                est = sk.estimate(np.array([int(k)], dtype=np.int64))
                ests[k] = int(np.atleast_1d(est)[0])
            except (ValueError, TypeError):
                ests[k] = int(sk.estimate(k))
        out["estimates"] = ests
    else:
        out["ndv_estimate"] = round(float(sk.estimate()), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
