"""A/B: does a small code cache reproduce the 10x-CPU slow mode?
Builds a bench-like session with ReservedCodeCacheSize taken from
argv[1], fills the cache (headliner warmups at sf0.01), then times 6
jaccard shots on the stress replica with the same diagnostics."""
import os, sys, time
sys.path.insert(0, "/root/repo")
CC = sys.argv[1] if len(sys.argv) > 1 else "512m"
from pyspark.sql import SparkSession
from hdsp_hive_release_src_spark.session import bench_driver_mem
spark = (
    SparkSession.builder.appName(f"cc_ab_{CC}")
    .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS','*')}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64*1024*1024))
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.driver.memory", bench_driver_mem())
    .config("spark.driver.extraJavaOptions", f"-XX:ReservedCodeCacheSize={CC}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from hdsp_hive_release_src_spark import registry
registry.load_all()
jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory

def diag():
    beans = mf.getGarbageCollectorMXBeans()
    gc = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    code = None
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        nm = p.getName()
        if "profiled nmethods" in nm and "non-" not in nm:
            u = p.getUsage()
            code = (round(u.getUsed()/2**20,1), round(u.getMax()/2**20,1))
    return gc, code

import subprocess
def cpu_s():
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit(): continue
        try:
            with open(f"/proc/{pid}/stat") as f: parts = f.read().split()
            if int(parts[3]) == me and "java" in parts[1]:
                return (int(parts[13])+int(parts[14]))/(os.sysconf('SC_CLK_TCK') or 100)
        except (OSError, ValueError, IndexError): continue
    return 0.0

print(f"=== code cache {CC}, max seg:", diag()[1], flush=True)
# fill the cache: run many distinct queries once (compiles fresh
# Janino classes per distinct plan)
fill = ["q1_pricing_summary","q3_shipping_priority","q5_local_supplier_volume",
        "q9_product_profit","q18_large_volume_customer","window_topk_per_group",
        "sessionization","ann_bruteforce_topk","semantic_dedup",
        "heavy_hitters_topk","count_min_sketch_freq","pagerank_trade_graph",
        "dedup_components","dedup_minhash_lsh","bm25_ranked_retrieval",
        "rfm_segmentation","kmeans_clusters","abc_pareto_class"]
for n in fill:
    try: registry.QUERIES[n](spark, "/root/testdata/sf0.01").count()
    except Exception as ex: print("fill err", n, type(ex).__name__, flush=True)
print("after fill:", diag(), flush=True)
spark.range(0,100_000,1,32).mapInPandas(lambda it: it, "id long").count()
fn = registry.QUERIES["dedup_ngram_jaccard"]
fn(spark, "/root/testdata/sf0.001").count()  # codegen warm for target
dst = "/root/repo/_scratch/stress10x"
print("shot wall cpu cow gc_ms code(used,max)", flush=True)
for shot in range(6):
    spark.catalog.clearCache()
    g0, _ = diag(); c0 = cpu_s(); t0 = time.time()
    fn(spark, dst).count()
    w = time.time()-t0
    g1, code = diag(); c1 = cpu_s()
    print(f"{shot} {w:.2f} {c1-c0:.0f} {(c1-c0)/w:.1f} {g1-g0} {code}", flush=True)
