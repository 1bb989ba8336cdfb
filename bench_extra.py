"""Round-6 optimization measurement harness (bench.py stays frozen).

Times individual declared queries with the same methodology as bench.py
(collect(), cache cleared per sample) at any SF dir, optionally dumping
`.explain("formatted")` plans to plans/r06/. Usage:

    python bench_extra.py [--sf DIR] [--samples N] [--explain TAG] [query ...]

With no query names, runs the full BENCH_QUERIES list from bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from xsd2json_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump plans/r06/<query>_<TAG>.txt for each query")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = args.queries or BENCH_QUERIES
    spark = get_spark(app_name="bench_extra")
    qs = entrymod.queries()
    if any(n.startswith("emb_knn_lsh") for n in names):
        entrymod._ann_index_path(spark, args.sf, "lsh")
    if "emb_knn_ivf" in names:
        entrymod._ann_index_path(spark, args.sf, "ivf")

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    if not args.no_warm:
        for name in names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            qs[name](spark, args.sf).collect()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.samples):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).collect()
            samples[name].append(round(time.perf_counter() - t0, 3))
    med = {n: sorted(v)[len(v) // 2] for n, v in samples.items()}
    print(json.dumps({"sf": args.sf, "median": med, "samples": samples,
                      "total_median": round(sum(med.values()), 3)}))


if __name__ == "__main__":
    main()
