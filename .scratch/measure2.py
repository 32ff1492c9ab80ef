"""Round-5 scratch #2: IVF-PQ probe/rerank sweep + cluster separation."""
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.schemas import load_table
from event_streaming_toy_example_spark.functions.similarity import (
    brute_force_topk,
    cosine_similarity,
    ivf_assign,
    ivfpq_topk,
    ivfpq_encode,
    l2_normalize,
    train_ivf_centroids,
    train_pq_codebooks,
)
from event_streaming_toy_example_spark.plans.queries_ext import stage_once

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

M, KSUB, DIM = 8, 16, 64

for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    print(f"===== {sf_dir} =====")
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    exact = brute_force_topk(embs, queries, k=5).select("query_id", "neighbor_id")
    unit = l2_normalize(embs)
    cent_path = stage_once(
        lambda: train_ivf_centroids(unit, n_cells=16), "ivfpq_cent16u", sf_dir
    )
    centroids = spark.read.parquet(cent_path)
    book_path = stage_once(
        lambda: spark.createDataFrame(
            [
                (s, c, train_pq_codebooks(unit, m=M, k_sub=KSUB, dim=DIM)[s][c])
                for s in range(M)
                for c in range(KSUB)
            ],
            "sub int, code int, cent array<double>",
        ),
        f"pq_{M}x{KSUB}u",
        sf_dir,
    )
    rows = spark.read.parquet(book_path).collect()
    books = [[None] * KSUB for _ in range(M)]
    for r in rows:
        books[r.sub][r.code] = list(r.cent)
    index_path = stage_once(
        lambda: ivfpq_encode(unit, centroids, books, m=M, dim=DIM, normalized=True),
        f"ivfpq_idx{M}x{KSUB}u",
        sf_dir,
    )
    index = spark.read.parquet(index_path)
    for n_probe, rerank in [(8, 12), (8, 20), (10, 20)]:
        ann = ivfpq_topk(
            embs, queries, k=5, n_cells=16, n_probe=n_probe, m=M, k_sub=KSUB,
            dim=DIM, rerank=rerank, centroids=centroids, codebooks=books, index=index,
        )
        hits = (
            ann.select("query_id", "neighbor_id")
            .join(exact, ["query_id", "neighbor_id"])
            .groupBy("query_id").count().collect()
        )
        per_q = {r.query_id: r["count"] for r in hits}
        print(f"probe={n_probe} rerank={rerank}:",
              sorted((q, per_q.get(q, 0)) for q in range(5)))

    # cluster separation: mean cos to own centroid vs to global mean dir
    cpath = stage_once(
        lambda: train_ivf_centroids(unit, n_cells=8), "cluster_cent8u", sf_dir
    )
    cents = F.broadcast(
        spark.read.parquet(cpath).select(
            "cell", F.col("cent").cast("array<double>").alias("cent")
        )
    )
    assigned = ivf_assign(unit, cents, "vec_id", "embedding", n_probe=1)
    print("assigned cols:", assigned.columns)
    # join back to centroid vectors and normalized embedding
    uv = unit.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
    j = assigned.join(uv, "vid").join(cents, "cell")
    own = j.agg(F.avg(cosine_similarity(F.col("v"), F.col("cent")))).collect()[0][0]
    # global mean direction
    gm = unit.select(F.posexplode("embedding").alias("i", "x")).groupBy("i").agg(
        F.avg("x").alias("m")
    ).orderBy("i").collect()
    gvec = [r.m for r in gm]
    glob = unit.agg(
        F.avg(cosine_similarity(F.col("embedding"), F.array(*[F.lit(x) for x in gvec])))
    ).collect()[0][0]
    print(f"cluster sep: own={own:.4f} global={glob:.4f} margin={own-glob:.4f}")

    # tightened approx_count_distinct
    ev = load_table(spark, sf_dir, "events")
    acd = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", 0.02).alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()
    worst = max(abs(r.est - r.exact) * 1_000_000 // max(r.exact, 1) for r in acd)
    print(f"acd(rsd=0.02) days={len(acd)} worst_err_ppm={worst}")

    # hll at sf0.001 for floor check
    pt = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()
    worst_h = max(abs(r.est - r.exact) * 1_000_000 // max(r.exact, 1) for r in pt)
    print(f"hll worst_err_ppm={worst_h}")

spark.stop()
print("DONE")
