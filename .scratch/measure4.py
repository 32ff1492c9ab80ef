from pyspark.sql import functions as F
from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.schemas import load_table
from event_streaming_toy_example_spark.functions.similarity import embedding_near_dup_pairs
from event_streaming_toy_example_spark.plans.queries_ext import q_sim_embedding_near_dup_lsh

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    embs = load_table(spark, sf_dir, "embeddings")
    blocked = embedding_near_dup_pairs(embs, block_col="label", threshold=0.35).select("id_a", "id_b")
    lsh = q_sim_embedding_near_dup_lsh(spark, sf_dir).select("id_a", "id_b")
    n_b = blocked.count()
    n_hit = blocked.join(lsh, ["id_a", "id_b"]).count()
    print(f"{sf_dir}: blocked={n_b} lsh_found={n_hit}")
spark.stop()
print("DONE")
