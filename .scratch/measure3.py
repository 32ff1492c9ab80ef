from pyspark.sql import functions as F
from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.schemas import load_table
from event_streaming_toy_example_spark.functions.similarity import (
    brute_force_topk, cosine_similarity, ivfpq_topk, ivfpq_encode,
    l2_normalize, train_ivf_centroids, train_pq_codebooks,
)
from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_once, q_sim_embedding_near_dup_lsh,
)

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
M, KSUB, DIM = 8, 16, 64
for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    print(f"===== {sf_dir} =====")
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    exact = brute_force_topk(embs, queries, k=5).select("query_id", "neighbor_id")
    unit = l2_normalize(embs)
    cent_path = stage_once(lambda: train_ivf_centroids(unit, n_cells=16), "ivfpq_cent16u", sf_dir)
    centroids = spark.read.parquet(cent_path)
    book_path = stage_once(
        lambda: spark.createDataFrame(
            [(s, c, train_pq_codebooks(unit, m=M, k_sub=KSUB, dim=DIM)[s][c])
             for s in range(M) for c in range(KSUB)],
            "sub int, code int, cent array<double>"),
        f"pq_{M}x{KSUB}u", sf_dir)
    rows = spark.read.parquet(book_path).collect()
    books = [[None] * KSUB for _ in range(M)]
    for r in rows:
        books[r.sub][r.code] = list(r.cent)
    index = spark.read.parquet(stage_once(
        lambda: ivfpq_encode(unit, centroids, books, m=M, dim=DIM, normalized=True),
        f"ivfpq_idx{M}x{KSUB}u", sf_dir))
    for n_probe, rerank in [(8, 40), (10, 40)]:
        ann = ivfpq_topk(embs, queries, k=5, n_cells=16, n_probe=n_probe, m=M,
                         k_sub=KSUB, dim=DIM, rerank=rerank,
                         centroids=centroids, codebooks=books, index=index)
        hits = (ann.select("query_id", "neighbor_id").join(exact, ["query_id", "neighbor_id"])
                .groupBy("query_id").count().collect())
        per_q = {r.query_id: r["count"] for r in hits}
        print(f"probe={n_probe} rerank={rerank}:", sorted((q, per_q.get(q, 0)) for q in range(5)))
    # near-dup recall at this SF
    lsh = q_sim_embedding_near_dup_lsh(spark, sf_dir)
    a = embs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    ep = (a.join(b, F.col("id_a") < F.col("id_b"))
          .where(cosine_similarity(F.col("va"), F.col("vb")) >= 0.35).select("id_a", "id_b"))
    n_e, n_l = ep.count(), lsh.count()
    n_h = lsh.select("id_a", "id_b").join(ep, ["id_a", "id_b"]).count()
    print(f"neardup exact={n_e} lsh={n_l} hit={n_h} recall_ppm={n_h*1_000_000//max(n_e,1)}")
spark.stop()
print("DONE")
