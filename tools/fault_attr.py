"""One build level; after the build, walk /proc and report per-comm minflt
for every descendant of this process (JVM, pyspark daemons/workers), then
stop spark.  Usage: python fault_attr.py <cpus> <corpus> <index_dir> [extra_java_opts]
"""
import json, os, sys, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from data_prepper_spark.envtune import apply_malloc_tuning
apply_malloc_tuning()
from pyspark.sql import SparkSession
from data_prepper_spark.index.build import build_oneshot
from data_prepper_spark.index.config import IndexConfig


def proc_tree_faults(root_pid):
    """{comm: {'n': count, 'minflt': sum, 'cminflt': sum}} over descendants."""
    # build ppid map
    info = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split on last ')'
        lp = s.rindex(")")
        comm = s[s.index("(") + 1:lp]
        rest = s[lp + 2:].split()
        # rest[0]=state rest[1]=ppid rest[7]=minflt rest[8]=cminflt
        info[int(d)] = (comm, int(rest[1]), int(rest[7]), int(rest[8]))
    # descendants of root
    kids = {}
    for pid, (_, ppid, _, _) in info.items():
        kids.setdefault(ppid, []).append(pid)
    out = {}
    stack = [root_pid]
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        stack.extend(kids.get(p, []))
        if p == root_pid:
            continue
        comm, _, mf, cmf = info[p]
        rec = out.setdefault(comm, {"n": 0, "minflt": 0, "cminflt": 0})
        rec["n"] += 1
        rec["minflt"] += mf
        rec["cminflt"] += cmf
    return out


cpus = int(sys.argv[1]); corpus = sys.argv[2]; index_dir = sys.argv[3]
extra = sys.argv[4] if len(sys.argv) > 4 else ""

b = (SparkSession.builder.master(f"local[{cpus}]")
     .appName(f"fault_attr_{cpus}")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.driver.memory", "12g")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
if extra:
    b = b.config("spark.driver.extraJavaOptions", extra)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
base = proc_tree_faults(os.getpid())
pages = spark.read.parquet(corpus)
n_docs = pages.count()
cfg = IndexConfig.for_corpus(n_docs, block_size=128)
t0 = time.perf_counter()
stats = build_oneshot(spark, pages, index_dir, cfg)
build_s = time.perf_counter() - t0
tree = proc_tree_faults(os.getpid())
delta = {}
for comm, rec in tree.items():
    b0 = base.get(comm, {"minflt": 0, "cminflt": 0, "n": 0})
    delta[comm] = {"n": rec["n"],
                   "minflt_M": round((rec["minflt"] - b0["minflt"]) / 1e6, 1),
                   "cminflt_M": round((rec["cminflt"] - b0["cminflt"]) / 1e6, 1)}
print("RESULT " + json.dumps({"cpus": cpus, "n_docs": n_docs,
      "build_s": round(build_s, 3), "docs_per_sec": round(n_docs / build_s, 1),
      "extra": extra, "faults_by_comm": delta}))
spark.stop()
