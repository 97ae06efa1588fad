"""Ad-hoc pair probe (not part of the official artifact): stage a corpus
once, then run adjacent --level pairs via bench.py's level mode to measure
today's same-window efficiency at a given corpus size. Usage:
  python BENCH/probe_pair.py <docs> [pairs]
"""
import json, os, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SHM = "/dev/shm/meebench"
os.makedirs(f"{SHM}/work", exist_ok=True)
corpus = f"{SHM}/pages_probe.parquet"

import bench  # reuse make_session etc.

spark = bench.make_session(32)
spark.sparkContext.setLogLevel("ERROR")
from mee_spark.fixtures import gen_pages
gen_pages(spark, DOCS, num_partitions=bench.PARTITIONS).write.mode("overwrite").parquet(corpus)
spark.stop()

env = os.environ | {"MEE_BENCH_DOCS": str(DOCS),
                    "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
results = []
for p in range(PAIRS):
    order = [2, 8] if p % 2 == 0 else [8, 2]
    pair = {}
    for cores in order:
        t0 = time.monotonic()
        load0 = open("/proc/loadavg").read().split()[0]
        out = subprocess.run([sys.executable, "bench.py", "--level", str(cores), corpus],
                             capture_output=True, text=True, env=env, timeout=1800,
                             cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        rec = None
        for line in out.stdout.splitlines():
            if line.startswith("LEVEL "):
                rec = json.loads(line[6:])
        if rec is None:
            print("FAILED:", out.stderr[-1500:]); sys.exit(1)
        rec["load_at_start"] = float(load0)
        rec["wall_incl_warmup"] = round(time.monotonic() - t0, 1)
        pair[cores] = rec
        print(f"  local[{cores}]: {rec}", flush=True)
    eff = pair[8]["docs_per_sec"] / pair[2]["docs_per_sec"] / 4
    print(f"PAIR {p}: docs={DOCS} order={order} eff={eff:.3f}", flush=True)
    results.append({"pair": pair, "eff": round(eff, 3)})
print(json.dumps({"docs": DOCS, "pairs": results}))
