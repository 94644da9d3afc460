package graft.mm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The actual codecs are NOT available in this container, so the decode
  * step is a clearly-marked deterministic STUB (`stubDecode`); everything
  * Spark-side — schema, batched mapPartitions shape, partitioning, output
  * contract — is real and tested. Swapping `stubDecode` for an actual
  * JNI/ffmpeg/ImageIO call changes no plan shape.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no String round
  * trip); feature extraction runs batched per partition so a real decoder
  * can amortize native-context setup; the asset table partitions by
  * (modality) and prunes payload bytes unless the stage actually needs
  * them (column pruning keeps scans metadata-only).
  */
object MultiModal {

  /** Synthesize the asset table from the documents table: payload =
    * deterministic pseudo-bytes derived from the text (stands in for real
    * image/audio bytes), metadata = typed struct. */
  def assets(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("asset_id"),
      modality.as("modality"),
      // payload: sha-chained bytes of the text — opaque, deterministic
      to_binary(sha2(col("text"), 256), lit("hex")).as("payload"),
      struct(
        lit("stub/v1").as("codec"),
        (length(col("text")) % 640 + 64).cast("int").as("width"),
        (length(col("text")) % 480 + 48).cast("int").as("height"),
        (length(col("text")) * 37 % 90000 + 1000).cast("int").as("duration_ms"),
        col("lang").as("language")
      ).as("meta"))
  }

  /** STUB decoder: a real implementation would decode `payload` with an
    * image/audio codec. The stub derives a deterministic byte histogram —
    * same output type a real luminance-histogram extractor would have. */
  private def stubDecode(payload: Array[Byte]): Array[Int] = {
    // ??? <- real codec goes here; deterministic fake below
    val hist = new Array[Int](16)
    payload.foreach(b => hist(b & 0x0f) += 1)
    hist
  }

  /** Batched feature extraction: one decoder context per PARTITION (the
    * mapPartitions boundary is where a real codec would init), one feature
    * row per asset. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real codec: init native context here, close at iterator end
        it.map { case (id, modality, payload) =>
          val hist = stubDecode(payload)
          val total = hist.sum.toDouble
          val probs = hist.map(_ / total)
          val entropy = -probs.filter(_ > 0)
            .map(p => p * math.log(p) / math.log(2)).sum
          (id, modality, hist.toSeq,
            BigDecimal(entropy).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }
      .toDF("asset_id", "modality", "histogram", "entropy")
  }

  /** Frame sampling for "video" assets: every k-th 8-byte block of the
    * payload is a "frame" (a real implementation seeks keyframes); output
    * one row per sampled frame with a stable frame digest. */
  def sampleFrames(assets: DataFrame, everyK: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(8).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (frame, idx) =>
            (id, idx, frame.map("%02x".format(_)).mkString)
          }
      }
      .toDF("asset_id", "frame_idx", "frame_digest")
  }

  /** Per-modality feature statistics — the query a curation pipeline runs
    * to pick decode/filter thresholds. */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        round(avg(col("entropy")), 4).as("avg_entropy"),
        round(min(col("entropy")), 4).as("min_entropy"),
        round(max(col("entropy")), 4).as("max_entropy"))
      .orderBy("modality")

  /** Frame-sample summary (rows-only check; exercised in MultiModalSpec). */
  def frameSummary(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(spark, dir))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct("frame_digest").as("n_distinct_frames"))
      .orderBy("asset_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_feature_stats" -> featureStats,
    "mm_frame_summary" -> frameSummary,
  )

  /** Per-asset feature/frame tables dumped by graft.Verify under
    * outDir/_base: the decode stage is a stub (no codecs in container), so
    * the oracle checks the RELATIONAL layer over these dumps; the decode
    * plumbing itself is unit-tested (MultiModalSpec). */
  val baseTables: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s, d) =>
      extractFeatures(assets(s, d)).select("asset_id", "modality", "entropy")),
    "mm_frames" -> ((s, d) => sampleFrames(assets(s, d))),
  )

  val oracleSql: Map[String, String] = Map(
    "mm_feature_stats" ->
      """SELECT modality, count(*) AS n_assets,
         round(avg(entropy), 4) AS avg_entropy,
         round(min(entropy), 4) AS min_entropy,
         round(max(entropy), 4) AS max_entropy
         FROM read_parquet('__BASE__/mm_features/*.parquet')
         GROUP BY 1""",
    "mm_frame_summary" ->
      """SELECT asset_id, count(*) AS n_frames,
         count(DISTINCT frame_digest) AS n_distinct_frames
         FROM read_parquet('__BASE__/mm_frames/*.parquet')
         GROUP BY 1""",
  )
}
