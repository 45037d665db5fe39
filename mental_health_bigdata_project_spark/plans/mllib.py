"""[EXT] MLlib surface — the "Machine Learning for pattern analysis"
the reference *claims* but does not ship (README.md:13-14; SURVEY.md §0
"Claimed but absent").  Implemented here as the north star's
"DataFrame ops + MLlib + Spark SQL" prescribes.

All entries are rows-only checks (model internals are engine-specific),
but every pipeline is seeded/deterministic so row counts and schemas
are stable run-to-run.  Exact, oracle-checked twins of the same ideas
live in plans/textops.py (text_tfidf) and plans/textops.py
(dedup_ngram_jaccard) — MLlib is the scale path (hashed features, LSH
models, distributed training).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query
from .textops import tokens_col


@query("ml_tfidf_hashed")  # rows-only: hash-bucketed features are impl-specific
def ml_tfidf_hashed(spark, sf_dir):
    """HashingTF + IDF over documents: the fixed-width (no vocabulary
    shuffle) TF-IDF used when the corpus is too big to build an exact
    vocab.  Returns (doc_id, norm of the tf-idf vector, nnz)."""
    from pyspark.ml.feature import IDF, HashingTF

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 12)
    tfd = tf.transform(docs)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfd)
    out = idf.transform(tfd)

    # Norm/nnz via vector_to_array + native HOFs: stays JVM-side in
    # whole-stage codegen (r1 used two row-at-a-time Python UDFs here —
    # the per-row Python round-trip the engine's own policy bans).
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.sqrt(F.aggregate(arr, F.lit(0.0),
                           lambda acc, x: acc + x * x)).alias("tfidf_norm"),
        F.size(F.filter(arr, lambda x: x != 0.0)).cast("int").alias("n_nonzero"),
    )


@query("ml_minhash_lsh")  # rows-only: MLlib hash families are impl-specific
def ml_minhash_lsh(spark, sf_dir):
    """MLlib MinHashLSH near-dup join over hashed shingle vectors —
    the library twin of plans/similarity.dedup_minhash_near (which is
    the hand-rolled, dependency-free version).  Returns candidate pairs
    with Jaccard distance <= 0.5."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("tokens"))
    # 3-gram shingles (sequence-sensitive, like dedup_minhash_near —
    # bare token *sets* are non-discriminative on a small vocabulary),
    # then binary hashing for set-Jaccard semantics.
    shingled = NGram(n=3, inputCol="tokens", outputCol="shingles").transform(docs)
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 14, binary=True)
    feat = tf.transform(shingled).filter(F.expr("size(shingles) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=8, seed=42).fit(feat)
    pairs = lsh.approxSimilarityJoin(feat, feat, 0.5, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


@query("ml_kmeans_embeddings")  # rows-only: cluster ids are seed/impl-specific
def ml_kmeans_embeddings(spark, sf_dir):
    """Seeded KMeans over the embedding column: cluster sizes per
    (cluster, majority-label) — the standard embedding-space structure
    probe for a training corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    model = KMeans(k=8, seed=42, featuresCol="features").fit(emb)
    pred = model.transform(emb)
    return pred.groupBy("prediction").agg(
        F.count("*").alias("n"),
        F.countDistinct("label").alias("n_labels"))


@query("ml_classify_embeddings")  # rows-only: coefficients impl-specific
def ml_classify_embeddings(spark, sf_dir):
    """Seeded logistic regression embedding -> label (train on vec_id
    hash split, evaluate on holdout): returns per-label precision-ish
    counts.  The 'pattern analysis' ML the reference README promises."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    lr = LogisticRegression(maxIter=20, regParam=0.01)
    model = lr.fit(train)
    pred = model.transform(test)
    return pred.groupBy("label").agg(
        F.count("*").alias("n_test"),
        F.sum(F.when(F.col("prediction") == F.col("label"), 1).otherwise(0))
        .cast("bigint").alias("n_correct"))


@query("ml_fpgrowth_itemsets")  # rows-only: lattice traversal order is impl detail
def ml_fpgrowth_itemsets(spark, sf_dir):
    """FP-growth frequent itemsets over per-document distinct token
    baskets — market-basket mining applied to vocabulary co-occurrence
    (which word sets co-occur in >= 40% of documents).  MLlib's
    parallel FP-growth (PFP, Li et al. 2008) partitions the lattice by
    suffix so no global FP-tree materializes — the scalable form of a
    combinatorial mining problem.  Itemset arrays are sorted and the
    support counts are exact, so rows are deterministic; the singleton
    supports are independently pinned against plain document
    frequencies in tests/test_operators_ext.py.  The itemset array is
    serialized to a space-joined string so every output cell is a
    hashable scalar (the driver's canonicalizer can't factorize
    ArrayType cells — CORRECTNESS_r02's vec_* ERR)."""
    from pyspark.ml.fpm import FPGrowth

    from .textops import tokens_col

    baskets = (load_table(spark, sf_dir, "documents")
               .select("doc_id", F.array_distinct(tokens_col()).alias("items")))
    model = FPGrowth(itemsCol="items", minSupport=0.4,
                     minConfidence=0.5).fit(baskets)
    return (model.freqItemsets
            .filter(F.size("items") <= 3)
            .select(F.array_join(F.array_sort("items"), " ").alias("itemset"),
                    "freq"))


@query("ml_pca_embeddings")  # rows-only: eigenvector basis impl-specific
def ml_pca_embeddings(spark, sf_dir):
    """PCA dimensionality reduction 64 -> 8 over the embedding column
    (MLlib computes the exact Gramian in one distributed pass — one
    treeAggregate over the corpus — then eigendecomposes the 64x64
    matrix on the driver; corpus size never touches the
    eigendecomposition).  Returns per-label mean projected coordinates
    on the first two components: the embedding-space structure summary
    a corpus report would chart.  The dense projection itself is a
    map-side matrix multiply against the broadcast 64x8 basis — the
    standard pre-step that makes downstream ANN/clustering 8x cheaper
    at 100 TB.  Rows-only (eigenvector sign/basis is
    implementation-specific); tests/test_operators_ext.py pins
    explained-variance monotonicity and basis orthonormality."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"))
    model = PCA(k=8, inputCol="features", outputCol="pca").fit(emb)
    proj = model.transform(emb).select(
        "label", vector_to_array(F.col("pca")).alias("p"))
    return (proj.groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg(F.element_at("p", 1)), 6).alias("mean_pc1"),
                 F.round(F.avg(F.element_at("p", 2)), 6).alias("mean_pc2"))
            )


@query("ml_als_recommend")  # rows-only: factor initialization is impl/seed-specific
def ml_als_recommend(spark, sf_dir):
    """Seeded implicit-feedback ALS over the (user, event_type)
    interaction matrix — the canonical Spark MLlib collaborative
    filter: interactions are per-user event-type counts, factors are
    rank-4, and the output is each user's top-2 recommended event
    types with the model's score, plus whether the user had actually
    interacted with that type (seen) — the self-evaluation every
    recommender demo starts from.

    Scale shape: ALS is MLlib's flagship distributed factorization
    (block-partitioned factors, alternating normal equations); the
    interaction matrix here is users x 5 event types, so the heavy
    side is the one hash agg building it.  Rows-only: factor values
    depend on initialization internals; the invariant test pins that
    recommendations are dominated by types the user actually used."""
    from pyspark.ml.recommendation import ALS

    ev = load_table(spark, sf_dir, "events")
    types = (ev.select("event_type").distinct()
             .withColumn("type_id",
                         F.dense_rank().over(
                             Window.orderBy("event_type")) - 1))
    inter = (ev.join(types, "event_type")
             .groupBy("user_id", "type_id")
             .agg(F.count("*").cast("float").alias("cnt")))
    als = ALS(rank=4, maxIter=8, seed=42, implicitPrefs=True,
              userCol="user_id", itemCol="type_id", ratingCol="cnt",
              coldStartStrategy="drop")
    model = als.fit(inter)
    recs = (model.recommendForAllUsers(2)
            .select("user_id", F.posexplode("recommendations")
                    .alias("rank0", "rec"))
            .select("user_id", (F.col("rank0") + 1).alias("rnk"),
                    F.col("rec.type_id").alias("type_id"),
                    F.round(F.col("rec.rating"), 4).alias("score")))
    return (recs.join(inter.select("user_id", "type_id",
                                   F.lit(1).alias("seen")),
                      ["user_id", "type_id"], "left")
            .select("user_id", "rnk", "type_id", "score",
                    F.coalesce("seen", F.lit(0)).cast("int").alias("seen")))
