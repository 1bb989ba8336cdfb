"""Attribution bench for the 8->32-core efficiency residual: the SAME
parquet scan at both parallelism levels, once SCAN-BOUND (bytes move,
trivial compute) and once CPU-BOUND (same bytes, ~10x compute per byte
via double sha2). If the CPU-bound variant scales near-linearly while
the scan-bound one plateaus, the residual is the host's shared memory
subsystem — which a real N-vs-4N EXECUTOR comparison (each node owning
its own memory bus) does not share — and not the plan shape.

Methodology matches tools/scaling_bench.py: fresh JVM per child,
ParallelGC + 48g heap both levels, 8-core child CPU-pinned, JIT warm-up
off the clock, interleaved children.

Usage: python tools/bandwidth_vs_cpu_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from xsd2json_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1]); path = sys.argv[2]
import os as _os
mpb = _os.environ.get("SCALE_MAX_PARTITION_BYTES", str(128 * 1024 * 1024))
spark = get_spark(app_name=f"bw{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=cores,
                  extra_conf={{"spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
                               "spark.driver.memory": "48g",
                               "spark.sql.files.maxPartitionBytes": mpb}})
df = spark.read.parquet(path)
df.count()
print("NPART " + str(df.rdd.getNumPartitions()))

SCAN = [F.sum(F.length("content")).alias("a"), F.sum(F.length("path")).alias("b")]
CPU = [F.sum(F.length(F.sha2(F.col("content"), 256))).alias("a"),
       F.sum(F.length(F.sha2(F.reverse(F.col("content")), 512))).alias("b")]

def timed(exprs, n=2):
    q = lambda: df.groupBy().agg(*exprs).collect()
    q()  # JIT warm-up
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); q(); ts.append(round(time.perf_counter() - t0, 3))
    return ts

print("RESULT " + json.dumps({{"cores": cores, "scan": timed(SCAN), "cpu": timed(CPU)}}))
"""


def run_child(cores: int, path: str, pin: bool = True) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), path]
    if pin and cores < 32 and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env={**os.environ, "PYTHONPATH": REPO})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child local[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    path = f"/tmp/bench_files_{n_rows}.parquet"
    results = {8: [], 32: []}
    for cores in (8, 32, 8, 32):
        r = run_child(cores, path)
        print(f"child local[{cores}]: scan {r['scan']} s, cpu {r['cpu']} s")
        results[cores].append(r)

    def best(level, kind):
        return min(t for r in results[level] for t in r[kind])

    report = {
        "n_rows": n_rows,
        "scan_bound": {"8": best(8, "scan"), "32": best(32, "scan"),
                       "eff": round(best(8, "scan") / best(32, "scan") / 4, 3)},
        "cpu_bound": {"8": best(8, "cpu"), "32": best(32, "cpu"),
                      "eff": round(best(8, "cpu") / best(32, "cpu") / 4, 3)},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
