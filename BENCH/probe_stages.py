"""Stage-level occupancy probe: run the timed build with eventLog on,
then report per-stage wall, tasks, and core-occupancy = executorRunTime /
(wall * cores). Usage: python BENCH/probe_stages.py <cores> <docs>"""
import glob, json, os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CORES, DOCS = int(sys.argv[1]), int(sys.argv[2])
SHM = "/dev/shm/meebench"
EV = f"{SHM}/evlog"
os.makedirs(f"{SHM}/work", exist_ok=True)
os.makedirs(EV, exist_ok=True)
tempfile.tempdir = f"{SHM}/work"

import bench
from pyspark.sql import SparkSession
from mee_spark.build import build_full_index
from mee_spark.config import IndexConfig
from mee_spark.fixtures import gen_pages

spark = (SparkSession.builder.master(f"local[{CORES}]")
         .appName(f"stageprobe-{CORES}")
         .config("spark.sql.shuffle.partitions", str(bench.PARTITIONS))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.local.dir", f"{SHM}/sparktmp")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.sql.files.openCostInBytes", "131072")
         .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", os.environ.get("PF", "true"))
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", os.environ.get("ADV", "64m"))
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.dir", EV)
         .config("spark.eventLog.compress", "false")
         .config("spark.eventLog.rolling.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(num_doc_partitions=bench.PARTITIONS, num_term_buckets=32,
                  doc_range_size=1 << 15)
corpus = f"{SHM}/pages_probe.parquet"
if not os.path.exists(corpus + "/_SUCCESS"):
    gen_pages(spark, DOCS, num_partitions=bench.PARTITIONS).write.mode(
        "overwrite").parquet(corpus)
wu = os.path.join(tempfile.mkdtemp(), "wu.parquet")
gen_pages(spark, bench.WARMUP_DOCS, num_partitions=64).write.mode("overwrite").parquet(wu)
build_full_index(spark, spark.read.parquet(wu), cfg, tempfile.mkdtemp(), gen=1)

t_mark = time.time() * 1000  # event timestamps are epoch ms
t0 = time.monotonic()
build_full_index(spark, spark.read.parquet(corpus), cfg, tempfile.mkdtemp(), gen=1, resume=False)
total = time.monotonic() - t0
app_id = spark.sparkContext.applicationId
spark.stop()

stages = {}
jobs = []
for path in glob.glob(f"{EV}/{app_id}*") or glob.glob(f"{EV}/eventlog_v2_{app_id}/events_*"):
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if not sub or sub < t_mark:
                continue
            run = sum(0 for _ in ())
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split()[0],
                "tasks": si["Number of Tasks"],
                "wall": (comp - sub) / 1000.0,
                "sub": (sub - t_mark) / 1000.0,
            }
        elif e.get("Event") == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            rt = m.get("Executor Run Time", 0)
            if sid in stages:
                stages[sid].setdefault("run_ms", 0)
                stages[sid]["run_ms"] += rt
# TaskEnd events may precede StageCompleted in file order; second pass
for path in glob.glob(f"{EV}/{app_id}*") or glob.glob(f"{EV}/eventlog_v2_{app_id}/events_*"):
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("Event") == "SparkListenerTaskEnd" and e["Stage ID"] in stages:
            s = stages[e["Stage ID"]]
            if "run2" not in s:
                s["run2"] = 0
            s["run2"] += (e.get("Task Metrics") or {}).get("Executor Run Time", 0)

print(f"TOTAL cores={CORES} docs={DOCS} wall={total:.2f}")
tot_run = 0
for sid in sorted(stages):
    s = stages[sid]
    run = s.get("run2", 0) / 1000.0
    tot_run += run
    occ = run / (s["wall"] * CORES) if s["wall"] > 0 else 0
    print(f"stage {sid:>3} t+{s['sub']:7.2f}s wall={s['wall']:6.2f}s tasks={s['tasks']:>4} "
          f"cpu={run:7.2f}s occ={occ:4.2f} {s['name'][:60]}")
gaps = total - sum(s["wall"] for s in stages.values())
print(f"sum(stage wall)={sum(s['wall'] for s in stages.values()):.2f}s "
      f"cpu_total={tot_run:.1f} core-sec; driver/gap time={gaps:.2f}s of {total:.2f}s")
