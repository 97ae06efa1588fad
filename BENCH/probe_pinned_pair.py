"""Concurrent pinned-pair probe: run local[2] pinned to cores 0-3 and
local[8] pinned to cores 4-19 AT THE SAME TIME on the same corpus.
Host-level dilation (hypervisor co-tenancy, invisible to /proc) then
hits both levels during the same seconds and cancels in the ratio —
and disjoint affinity masks emulate what N and 4N executor clusters
actually are: separate hardware. Usage: probe_pinned_pair.py <docs> [reps]
"""
import json, os, subprocess, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DOCS = int(sys.argv[1]); REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SHM = "/dev/shm/meebench"
os.makedirs(f"{SHM}/work", exist_ok=True)
corpus = f"{SHM}/pages_probe.parquet"
import bench
if not os.path.exists(corpus + "/_SUCCESS"):
    spark = bench.make_session(32); spark.sparkContext.setLogLevel("ERROR")
    from mee_spark.fixtures import gen_pages
    gen_pages(spark, DOCS, num_partitions=bench.PARTITIONS).write.mode("overwrite").parquet(corpus)
    spark.stop()
env = os.environ | {"MEE_BENCH_DOCS": str(DOCS), "PYTHONPATH": "/root/repo"}

def spawn(cores, cpuset):
    def pin():
        os.sched_setaffinity(0, cpuset)
    return subprocess.Popen([sys.executable, "bench.py", "--level", str(cores), corpus],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env, preexec_fn=pin, cwd="/root/repo")

for rep in range(REPS):
    t0 = time.monotonic()
    p2 = spawn(2, set(range(0, 4)))
    p8 = spawn(8, set(range(4, 20)))
    recs = {}
    for cores, p in ((2, p2), (8, p8)):
        out, err = p.communicate(timeout=1800)
        rec = next((json.loads(l[6:]) for l in out.splitlines() if l.startswith("LEVEL ")), None)
        if rec is None:
            print(f"FAILED level {cores}: {err[-1200:]}"); sys.exit(1)
        recs[cores] = rec
        print(f"  local[{cores}] pinned: {rec}", flush=True)
    eff = recs[8]["docs_per_sec"] / recs[2]["docs_per_sec"] / 4
    print(f"PINNED PAIR rep={rep} docs={DOCS} wall={time.monotonic()-t0:.0f}s eff={eff:.3f}", flush=True)
