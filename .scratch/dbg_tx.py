from pyspark.sql import functions as F
from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.schemas import load_table
from event_streaming_toy_example_spark.operators import txtable as tx
import tempfile, os

spark = get_spark(shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.01"
tmp = tempfile.mkdtemp(prefix="txdbg_") + "/t"
ev = load_table(spark, sf_dir, "events").select("event_id","ts","user_id","event_type","value")
pre = ev.where(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
late = ev.where(F.col("ts") >= F.lit("2024-01-15").cast("timestamp")).withColumn("late_tag", F.lit("late"))
print("v1", tx.tx_append(pre.repartition(4), tmp), "files:", len(tx.snapshot(tmp).files))
print("v2", tx.tx_append(late.repartition(4), tmp), "files:", len(tx.snapshot(tmp).files))
mod = ev.where(F.col("event_id") % 100 == 0)
updates = mod.select("event_id","ts","user_id","event_type",(F.col("value")+F.lit(1000.0)).alias("value"),F.lit("upd").alias("late_tag"))
inserts = mod.select((F.col("event_id")+F.lit(10_000_000)).alias("event_id"),"ts","user_id","event_type",F.lit(7.0).alias("value"),F.lit("ins").alias("late_tag"))
print("v3", tx.tx_upsert(spark, tmp, updates.unionByName(inserts), keys=["event_id"], order_by=["ts"]))
snap = tx.snapshot(tmp)
print("files after upsert:", len(snap.files))
for f in snap.files:
    print("  ", f, os.path.getsize(os.path.join(tmp,f)))
print("compact:", tx.tx_compact(spark, tmp, target_bytes=1<<30))
spark.stop()
