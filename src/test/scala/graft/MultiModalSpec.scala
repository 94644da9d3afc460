package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.mm.MultiModal

class MultiModalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val dir = "/root/testdata/sf0.001"

  test("asset table: binary payload + typed metadata struct") {
    val a = MultiModal.assets(spark, dir)
    val schema = a.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val row = a.orderBy("asset_id").first()
    assert(row.getAs[Array[Byte]]("payload").length == 32) // sha256 bytes
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("codec") == "stub/v1")
    assert(meta.getAs[Int]("width") >= 64)
    assert(a.select("modality").distinct().count() == 3)
  }

  test("feature extraction: histogram sums to payload length, deterministic") {
    val f = MultiModal.extractFeatures(MultiModal.assets(spark, dir))
      .orderBy("asset_id").collect()
    assert(f.length == 500)
    f.take(20).foreach { r =>
      val hist = r.getSeq[Int](2)
      assert(hist.length == 16)
      assert(hist.sum == 32) // sha256 payload = 32 bytes
      val e = r.getDouble(3)
      assert(e >= 0.0 && e <= 4.0) // 16 buckets -> max 4 bits
    }
    val f2 = MultiModal.extractFeatures(MultiModal.assets(spark, dir))
      .orderBy("asset_id").collect()
    assert(f.toSeq == f2.toSeq)
  }

  test("frame sampling: every 2nd 8-byte block of video assets") {
    val vids = MultiModal.assets(spark, dir)
      .filter(col("modality") === "video").count()
    val frames = MultiModal.sampleFrames(MultiModal.assets(spark, dir))
    // 32-byte payload -> 4 blocks -> 2 sampled frames per video
    assert(frames.count() == vids * 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    assert(frames.filter(length(col("frame_digest")) =!= 16).count() == 0)
  }

  test("mm queries run and are non-empty") {
    MultiModal.queries.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() > 0, name)
    }
  }
}
