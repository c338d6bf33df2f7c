"""One-off: replicate sf0.1 facts Nx with offset keys into /tmp/sf1x{N}
(N = $REPLICATE_COPIES, default 10; round-4 100x receipts used N=100).
Dims (region/nation/customer/supplier/part) copied unchanged; fact FKs
to dims stay in-range; fact PKs/join-keys offset per copy."""
import os, sys, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from elastic_freight_spark.session import get_spark, load_tables

COPIES = int(os.environ.get("REPLICATE_COPIES", "10"))
OUT = os.environ.get("REPLICATE_OUT", f"/tmp/sf1x{COPIES}")
SRC = "/root/testdata/sf0.1"
shutil.rmtree(OUT, ignore_errors=True)
os.makedirs(OUT)
spark = get_spark(app_name=f"make{COPIES}x", extra_conf={"spark.ui.showConsoleProgress": "false"})
t = load_tables(spark, SRC)

for d in ["region", "nation", "customer", "supplier", "part"]:
    t[d].write.parquet(os.path.join(OUT, f"{d}.parquet"))

def rep(df, offsets):  # offsets: {col: stride}
    parts = []
    for i in range(COPIES):
        e = df
        for c, stride in offsets.items():
            e = e.withColumn(c, (F.col(c) + F.lit(i * stride)).cast(df.schema[c].dataType))
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out

rep(t["orders"], {"o_orderkey": 100_000_000}).write.parquet(OUT + "/orders.parquet")
rep(t["lineitem"], {"l_orderkey": 100_000_000}).write.parquet(OUT + "/lineitem.parquet")
rep(t["events"], {"event_id": 100_000_000, "user_id": 1_000_000}).write.parquet(OUT + "/events.parquet")
rep(t["documents"], {"doc_id": 10_000_000}).write.parquet(OUT + "/documents.parquet")
rep(t["embeddings"], {"vec_id": 10_000_000}).write.parquet(OUT + "/embeddings.parquet")
for f in sorted(os.listdir(OUT)):
    print(f)
spark.stop()
