"""Phase-level timing of build_full_index at one core count (diagnosis
only): replicates the build body with timers. Usage:
  python BENCH/probe_phases.py <cores> <docs>
"""
import os, sys, tempfile, threading, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CORES, DOCS = int(sys.argv[1]), int(sys.argv[2])
SHM = "/dev/shm/meebench"
os.makedirs(f"{SHM}/work", exist_ok=True)
tempfile.tempdir = f"{SHM}/work"

import bench
from pyspark.sql import Observation
from pyspark.sql import functions as F
from mee_spark import manifest as mf
from mee_spark.build import _docmap_path, build_full_index
from mee_spark.config import IndexConfig
from mee_spark.docmap import assign_doc_ids
from mee_spark.fixtures import gen_pages
from mee_spark.postings import build_postings
from mee_spark.segments import build_segments
from mee_spark.textprep import extract_text, tokenize_col

spark = bench.make_session(CORES)
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(num_doc_partitions=bench.PARTITIONS, num_term_buckets=32,
                  doc_range_size=1 << 15)
corpus = f"{SHM}/pages_probe.parquet"
if not os.path.exists(corpus + "/_SUCCESS"):
    gen_pages(spark, DOCS, num_partitions=bench.PARTITIONS).write.mode(
        "overwrite").parquet(corpus)
# warmup (same as run_level)
wu = os.path.join(tempfile.mkdtemp(), "wu.parquet")
gen_pages(spark, bench.WARMUP_DOCS, num_partitions=64).write.mode("overwrite").parquet(wu)
build_full_index(spark, spark.read.parquet(wu), cfg, tempfile.mkdtemp(), gen=1)

pages = spark.read.parquet(corpus)
index_dir = tempfile.mkdtemp()
gen = 1
T = {}
t0 = time.monotonic()
os.makedirs(mf.gen_dir(index_dir, gen), exist_ok=True)
t = time.monotonic(); docmap = assign_doc_ids(pages, cfg.num_doc_partitions); T["assign_doc_ids"] = time.monotonic() - t

text_col = extract_text(F.col("html"))
docs_plan = (pages.select("url", text_col.alias("_text"))
             .withColumn("text_hash", F.xxhash64(F.col("_text")))
             .withColumn("tokens", tokenize_col(F.col("_text")))
             .withColumn("dl", F.size("tokens").cast("long"))
             .join(docmap, "url")
             .select("doc_id", "url", "tokens", "dl", "text_hash"))
staging = os.path.join(mf.gen_dir(index_dir, gen), "_docs_staging.parquet")
obs = Observation("cs")
t = time.monotonic()
docs_plan.observe(obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")).write.mode("overwrite").parquet(staging)
T["staging_write"] = time.monotonic() - t
n_docs = int(obs.get["n"])
for _c in getattr(docmap, "_cached_deps", []):
    _c.unpersist()
docs = spark.read.parquet(staging)
dm_done = []
def _dm():
    t = time.monotonic()
    docs.select("url", "doc_id", "dl", "text_hash").write.mode("overwrite").parquet(_docmap_path(index_dir, gen))
    dm_done.append(time.monotonic() - t)
th = threading.Thread(target=_dm, daemon=True); th.start()
t = time.monotonic()
postings = build_postings(docs)
pm = build_segments(postings, cfg, index_dir, gen, resume=False)
T["segments"] = time.monotonic() - t
th.join(); T["docmap_thread"] = dm_done[0]
T["TOTAL"] = time.monotonic() - t0
print(f"PHASES cores={CORES} docs={DOCS} " +
      " ".join(f"{k}={v:.2f}" for k, v in T.items()), flush=True)
spark.stop()
