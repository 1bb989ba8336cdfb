"""Host-ceiling attribution probes for the executor-scaling bench
(BENCH/EXECUTOR_SCALING.md): the SAME pinned 2-core vs 4x2-core shape
as tools/executor_scaling_bench.py --cores 2, but with two pure
workloads that bracket the validation job:

- CPU probe: sha256 over a 16 MiB cache-warm buffer per process —
  cache-resident compute, no memory streaming. Scaling here is the
  host's CPU ceiling for the 2->8-core shape.
- BANDWIDTH probe: copy+sum of a 256 MiB numpy array per process —
  pure memory streaming far beyond L3. Scaling here is the host's
  memory-bandwidth ceiling.

The validation job (parquet decompress + regex + sha over strings) is
a mix of the two; if its multi-JVM efficiency lands between the two
probes, the residual is the shared memory subsystem — which a real
multi-node cluster does not share — not the engine.

Usage: python tools/host_ceiling_probe.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import subprocess
import sys

CPU_CHILD = """
import hashlib, time, sys
buf = bytes(range(256)) * (1 << 16)  # 16 MiB, L3-resident
deadline = time.perf_counter() + float(sys.argv[1])
n = 0
while time.perf_counter() < deadline:
    hashlib.sha256(buf).digest()
    n += 1
print(n)
"""

BW_CHILD = """
import numpy as np, time, sys
a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB, streams from RAM
b = np.empty_like(a)
deadline = time.perf_counter() + float(sys.argv[1])
n = 0
while time.perf_counter() < deadline:
    np.copyto(b, a); b.sum()
    n += 1
print(n)
"""


def run(child: str, cores, window: float) -> float:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(c), sys.executable, "-c", child, str(window)],
            stdout=subprocess.PIPE,
        )
        for c in cores
    ]
    return sum(int(p.communicate()[0]) for p in procs) / window


def probe(child: str, window: float) -> dict:
    # interleave 2/8/2/8 so shared-VM phases hit both levels; best-of-2
    # per level (single-run outliers of 20x observed on this host)
    res = {2: [], 8: []}
    for cores in ([0, 1], list(range(8)), [0, 1], list(range(8))):
        res[len(cores)].append(round(run(child, cores, window), 1))
    t2, t8 = max(res[2]), max(res[8])
    return {
        "per_sec_2core": t2,
        "per_sec_8core": t8,
        "efficiency_2to8": round(t8 / t2 / 4, 3),
        "samples": {str(k): v for k, v in res.items()},
    }


def main():
    out = {
        "cpu_probe": probe(CPU_CHILD, 15.0),
        "bandwidth_probe": probe(BW_CHILD, 8.0),
    }
    # ~GB/s estimate: each pass touches 256 MiB write + 2x256 MiB read
    bw = out["bandwidth_probe"]
    out["approx_gbps_2core"] = round(bw["per_sec_2core"] * 0.75, 1)
    out["approx_gbps_8core"] = round(bw["per_sec_8core"] * 0.75, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
