package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label): brute-force cosine as the exact baseline, plus two
  * scale paths — random-hyperplane LSH bucketing and IVF (inverted-file)
  * partitioning — and embedding-space near-dup grouping via connected
  * components.
  *
  * Scale notes:
  *  - all dot products are native higher-order expressions
  *    (`aggregate(zip_with(...))`) in double precision — codegen'd, no UDF;
  *  - brute force is the correctness oracle and the small-probe-set path
  *    (probe broadcast x corpus scan = one narrow pass); the LSH/IVF paths
  *    prune the candidate set so the pairwise work is per-bucket, which is
  *    what survives 100x corpus growth;
  *  - norms are precomputed once per row, never per pair.
  */
object SimOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** sum(a[i]*b[i]) over already-double arrays (double math matches the
    * DuckDB oracle; the float→double cast happens ONCE per row in
    * [[withNorm]], never per pair). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Session-scoped cache of the brute pair scan: `sim_neardup_groups`
    * builds on `sim_cosine_pairs`, and the O(n²) scan is the expensive
    * part — compute it once per (session, dir, threshold). */
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Double), DataFrame]()

  /** All pairs with cosine similarity >= threshold (brute force via
    * self-join; exact). The 100 TB path replaces the crossing join with the
    * LSH/IVF candidate generation below — same verify expression. */
  def cosinePairs(spark: SparkSession, dir: String,
                  threshold: Double = 0.4): DataFrame =
    pairsCache.computeIfAbsent((spark, dir, threshold), { _ =>
      val e = withNorm(emb(spark, dir))
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= threshold)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
        .orderBy("vec_a", "vec_b")
        .persist()
    })

  /** Exact top-k cosine neighbors for a probe set (vec_id < nProbes),
    * brute force: broadcast the probes, scan the corpus once. Rank on the
    * ROUNDED similarity + vec_id so ordering is reproducible across
    * engines (fp summation-order noise can't flip ranks). */
  def knnBrute(spark: SparkSession, dir: String,
               k: Int = 5, nProbes: Int = 10): DataFrame = {
    val e = withNorm(emb(spark, dir))
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        round(dot(col("v"), col("pv")) / (col("nrm") * col("pn")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor"),
        col("cos"))
      .orderBy("probe_id", "rk")
  }

  // ------------------------------------------------------- LSH (hyperplane)
  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 of (p, d) scaled to [-1, 1). Pure column expression — no
    * Random, no overflow (ANSI-safe). */
  private def planeComponent(p: Int, d: Column): Column =
    xxhash64(lit(p), d).cast("double") / lit(Long.MaxValue.toDouble)

  /** Bucket-count/table-count tradeoff: planes fix the bucket count (2^p),
    * tables buy recall. Low-cosine corpora (near-random embeddings, like
    * the synthetic testdata where the closest pair is ~0.5) need few
    * planes — the angle to a "neighbor" is still ~60°, so each extra plane
    * costs (1 - 60/180) ≈ 2/3 collision probability. At 100 TB with real
    * clustered embeddings, raise planes to keep per-bucket candidate
    * counts bounded. */
  final val LshPlanes = 4 // 16 buckets/table
  final val LshTables = 6 // P(candidate | cos=0.5) ≈ 1-(1-(2/3)^4)^6 ≈ 0.73

  /** Per-row LSH bucket ids: sign pattern of `LshPlanes` hyperplane dots,
    * repeated for `LshTables` independent tables. Returns (vec_id, table,
    * bucket). */
  def lshBuckets(e: DataFrame): DataFrame = {
    val dims = size(col("v"))
    def bucketFor(table: Int): Column = {
      val bits = (0 until LshPlanes).map { p =>
        val planeId = table * LshPlanes + p
        val s = aggregate(
          zip_with(col("v"), sequence(lit(0), dims - 1),
            (x, i) => x.cast("double") * planeComponent(planeId, i)),
          lit(0.0), (acc, v) => acc + v)
        when(s >= 0, lit(1L << (p.toLong))).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val tables = array((0 until LshTables).map { t =>
      struct(lit(t).as("table"), bucketFor(t).as("bucket"))
    }: _*)
    e.select(col("vec_id"), col("v"), col("nrm"), explode(tables).as("x"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("x.table").as("table"), col("x.bucket").as("bucket"))
  }

  /** ANN top-k via hyperplane LSH: candidates = rows sharing (table,
    * bucket) with the probe in ANY of the tables; exact cosine on the
    * candidate set only. Output schema matches knnBrute (rank within found
    * candidates). */
  def lshKnn(spark: SparkSession, dir: String,
             k: Int = 5, nProbes: Int = 10): DataFrame = {
    val e = withNorm(emb(spark, dir))
    val buckets = lshBuckets(e).persist()
    val probes = buckets.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"), col("table"), col("bucket"))
    val cand = buckets.join(probes, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "pv", "pn", "vec_id", "v", "nrm")
      .dropDuplicates("probe_id", "vec_id")
    val scored = cand.withColumn("cos",
      round(dot(col("v"), col("pv")) / (col("nrm") * col("pn")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor"),
        col("cos"))
      .orderBy("probe_id", "rk")
  }

  // --------------------------------------------------------------- IVF
  final val IvfLists = 16
  final val IvfProbeLists = 4

  /** IVF ANN: coarse centroids = a deterministic sample of the corpus
    * (every n/IvfLists-th vector — a seeded stand-in for k-means; the
    * assignment/search shape is identical). Each vector is assigned to its
    * nearest centroid; a probe searches only its IvfProbeLists nearest
    * centroid lists. */
  def ivfKnn(spark: SparkSession, dir: String,
             k: Int = 5, nProbes: Int = 10): DataFrame = {
    val e = withNorm(emb(spark, dir)).persist()
    val n = e.count()
    val step = math.max(1L, n / IvfLists)
    val centroids = e.filter(pmod(col("vec_id"), lit(step)) === 0 &&
        col("vec_id") < step * IvfLists)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    def assign(df: DataFrame, idCol: String, vCol: String, nCol: String,
               keep: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("csim").desc, col("cid").asc)
      df.join(broadcast(centroids), col(idCol).isNotNull)
        .withColumn("csim",
          round(dot(col(vCol), col("cv")) / (col(nCol) * col("cn")), 6))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= keep)
        .drop("cv", "cn", "csim", "crk")
    }
    val assigned = assign(e, "vec_id", "v", "nrm", 1) // one list per vector
    val probes = assign(
      e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"),
          col("nrm").as("pn")),
      "probe_id", "pv", "pn", IvfProbeLists) // multi-probe
    val cand = assigned.join(probes, Seq("cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .dropDuplicates("probe_id", "vec_id")
    val scored = cand.withColumn("cos",
      round(dot(col("v"), col("pv")) / (col("nrm") * col("pn")), 6))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor"),
        col("cos"))
      .orderBy("probe_id", "rk")
  }

  /** Embedding-space near-duplicate GROUPS: cosine pairs >= threshold →
    * connected components → (representative, members). Reuses the KG CC
    * operator — dedup at training-data scale is a graph problem. */
  def embeddingNeardupGroups(spark: SparkSession, dir: String,
                             threshold: Double = 0.45): DataFrame = {
    // reuse the cached 0.4-threshold scan and re-filter — the O(n²) scan
    // dominates, the threshold only trims its output
    val base = math.min(threshold, 0.4)
    val pairs = cosinePairs(spark, dir, base)
      .filter(col("cos") >= threshold)
      .select(col("vec_a").cast("string").as("src"),
        col("vec_b").cast("string").as("dst"))
    graft.kg.Cc.connectedComponents(pairs)
      .groupBy(col("canon").as("rep"))
      .agg(count(lit(1)).as("group_size"),
        sort_array(collect_list(col("uri").cast("long"))).as("members"))
      .select(col("rep").cast("long").as("rep"), col("group_size"),
        col("members"))
      .orderBy("rep")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_pairs" -> ((s, d) => cosinePairs(s, d)),
    "sim_knn_brute" -> ((s, d) => knnBrute(s, d)),
    "sim_lsh_knn" -> ((s, d) => lshKnn(s, d)),
    "sim_ivf_knn" -> ((s, d) => ivfKnn(s, d)),
    "sim_neardup_groups" -> ((s, d) => embeddingNeardupGroups(s, d)),
  )

  /** DuckDB oracles for the exact paths (LSH/IVF are approximate by design
    * → rows-only check + recall assertions in SimOpsSpec). */
  val oracleSql: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) >= 0.4
         ORDER BY vec_a, vec_b""",
    "sim_knn_brute" ->
      """WITH scored AS (
           SELECT p.vec_id AS probe_id, e.vec_id AS neighbor,
             round(list_cosine_similarity(p.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]), 6) AS cos
           FROM embeddings p JOIN embeddings e ON e.vec_id <> p.vec_id
           WHERE p.vec_id < 10),
         ranked AS (
           SELECT probe_id, neighbor, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor ASC) AS rk
           FROM scored)
         SELECT probe_id, rk, neighbor, cos FROM ranked
         WHERE rk <= 5 ORDER BY probe_id, rk""",
  )
}
