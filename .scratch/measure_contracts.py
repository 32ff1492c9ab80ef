"""Round-5 scratch: measure margins for the approximate-operator contracts."""
import sys

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.schemas import load_table

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    print(f"===== {sf_dir} =====")

    # ---- 1. IVF-PQ recall@5 ----
    from event_streaming_toy_example_spark.plans.queries_ext11 import q_sim_ivfpq_topk
    from event_streaming_toy_example_spark.functions.similarity import brute_force_topk

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    exact = brute_force_topk(embs, queries, k=5)
    ann = q_sim_ivfpq_topk(spark, sf_dir)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id").count().collect()
    )
    print("ivfpq recall@5 hits per query:", sorted((r.query_id, r["count"]) for r in hits))

    # ---- 2. HLL error ppm per event_type ----
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()
    all_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()[0]
    rows = [(r.event_type, r.est, r.exact) for r in per_type] + [("__all__", all_est.est, all_est.exact)]
    for t, est, exact_n in sorted(rows):
        ppm = abs(est - exact_n) * 1_000_000 // max(exact_n, 1)
        print(f"hll {t}: est={est} exact={exact_n} err_ppm={ppm}")

    # ---- 3. approx_percentile error per priority ----
    orders = load_table(spark, sf_dir, "orders")
    qp = orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a90"),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("a99"),
        F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("e90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("e99"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    for r in sorted(qp, key=lambda r: r.o_orderpriority):
        span = r.hi - r.lo
        print(
            f"pct {r.o_orderpriority}: n={r.n} "
            f"rel50={abs(r.a50-r.e50)/span:.5f} rel90={abs(r.a90-r.e90)/span:.5f} "
            f"rel99={abs(r.a99-r.e99)/span:.5f}"
        )

    # ---- 4. approx_count_distinct per day ----
    acd = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id").alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()
    worst = max(abs(r.est - r.exact) * 1_000_000 // max(r.exact, 1) for r in acd)
    print(f"acd days={len(acd)} worst_err_ppm={worst}")

    # ---- 5. LSH near-dup recall vs exact unblocked all-pairs ----
    from event_streaming_toy_example_spark.plans.queries_ext import (
        q_sim_embedding_near_dup_lsh,
    )
    from event_streaming_toy_example_spark.functions.similarity import cosine_similarity

    lsh_pairs = q_sim_embedding_near_dup_lsh(spark, sf_dir)
    print("lsh near-dup columns:", lsh_pairs.columns)
    a = embs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact_pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(cosine_similarity(F.col("va"), F.col("vb")) >= 0.35)
        .select("id_a", "id_b")
    )
    n_exact = exact_pairs.count()
    n_lsh = lsh_pairs.count()
    n_hit = lsh_pairs.select("id_a", "id_b").join(exact_pairs, ["id_a", "id_b"]).count()
    print(f"neardup exact={n_exact} lsh={n_lsh} hit={n_hit}")

    # ---- 6. cluster quality ----
    from event_streaming_toy_example_spark.plans.queries_ext13 import q_cluster_embeddings

    cl = q_cluster_embeddings(spark, sf_dir).collect()
    n_corpus = embs.count()
    print(f"cluster: n_clusters={len(cl)} assigned={sum(r.n_vecs for r in cl)} corpus={n_corpus}")

spark.stop()
print("DONE")
