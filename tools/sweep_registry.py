"""Time EVERY registered query at sf0.1 (noop sink), print sorted."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from elastic_freight_spark.session import get_spark, load_tables

spark = get_spark(app_name="sweep", extra_conf={"spark.ui.showConsoleProgress": "false"})
import __spark_entry__ as e
q = e.queries()
sf = "/root/testdata/sf0.1"
load_tables(spark, sf)["lineitem"].count()
out = {}
for n, fn in q.items():
    t0 = time.perf_counter()
    try:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        out[n] = round(time.perf_counter() - t0, 2)
    except Exception as ex:
        out[n] = f"ERR {type(ex).__name__}"
for n, v in sorted(out.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)):
    if isinstance(v, str) or v >= 2.0:
        print(v, n)
tot = sum(v for v in out.values() if isinstance(v, float))
print(json.dumps({"total_sec": round(tot,1), "n": len(out)}))
spark.stop()
