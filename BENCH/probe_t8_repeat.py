"""Run the 4N level repeatedly (fresh JVM each) to characterize crater
runs. Usage: python BENCH/probe_t8_repeat.py <docs> <n_runs>"""
import json, os, subprocess, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DOCS, N = int(sys.argv[1]), int(sys.argv[2])
SHM = "/dev/shm/meebench"
os.makedirs(f"{SHM}/work", exist_ok=True)
corpus = f"{SHM}/pages_probe.parquet"
import bench
if not os.path.exists(corpus + "/_SUCCESS"):
    spark = bench.make_session(32); spark.sparkContext.setLogLevel("ERROR")
    from mee_spark.fixtures import gen_pages
    gen_pages(spark, DOCS, num_partitions=bench.PARTITIONS).write.mode("overwrite").parquet(corpus)
    spark.stop()
env = os.environ | {"MEE_BENCH_DOCS": str(DOCS), "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
for i in range(N):
    l0 = open("/proc/loadavg").read().split()[0]
    t0 = time.monotonic()
    out = subprocess.run([sys.executable, "bench.py", "--level", "8", corpus],
                         capture_output=True, text=True, env=env, timeout=1800, cwd="/root/repo")
    rec = next((json.loads(l[6:]) for l in out.stdout.splitlines() if l.startswith("LEVEL ")), None)
    print(f"run {i}: load0={l0} wall={time.monotonic()-t0:.0f} {rec}", flush=True)
