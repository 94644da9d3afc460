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
    val a = MultiModal.assets(spark, dir).orderBy("asset_id").collect()
    val schema = MultiModal.assets(spark, dir).schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    a.foreach { row =>
      val payload = row.getAs[Array[Byte]]("payload")
      val meta = row.getStruct(row.fieldIndex("meta"))
      row.getAs[String]("modality") match {
        case "image" =>
          // REAL PNG bytes: magic header + the advertised dimensions
          assert(payload.take(8).map(_ & 0xff).toSeq ==
            Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
          assert(meta.getAs[String]("codec") == "image/png")
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          assert(img.getWidth == meta.getAs[Int]("width"))
          assert(img.getHeight == meta.getAs[Int]("height"))
        case "audio" =>
          // REAL WAV bytes: RIFF/WAVE container magic
          assert(new String(payload.take(4), "US-ASCII") == "RIFF")
          assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
          assert(meta.getAs[String]("codec") == "audio/wav")
          assert(meta.getAs[Int]("duration_ms") > 0)
        case _ =>
          // REAL Y4M bytes: magic header, dims match the container
          assert(new String(payload.take(9), "US-ASCII") == "YUV4MPEG2")
          assert(meta.getAs[String]("codec") == "video/y4m")
          val vid = graft.mm.Y4m.decode(payload)
          assert(vid.width == meta.getAs[Int]("width"))
          assert(vid.height == meta.getAs[Int]("height"))
          assert(vid.durationMs == meta.getAs[Int]("duration_ms"))
          assert(vid.frames.nonEmpty)
      }
    }
    assert(a.map(_.getAs[String]("modality")).distinct.length == 3)
  }

  test("WAV encode/decode round-trip: histogram equals direct computation") {
    val seed = Array.tabulate(32)(i => (i * 11 + 3).toByte)
    val samples = MultiModal.pcmSamples(seed, 1234)
    val viaWav = MultiModal.decodeAudio(MultiModal.wavEncode(samples))
    // direct amplitude histogram from the same samples, no codec
    val direct = new Array[Int](16)
    samples.foreach(s => direct((s + 32768) >> 12) += 1)
    assert(viaWav.toSeq == direct.toSeq)
    assert(viaWav.sum == 1234)
    assert(viaWav.count(_ > 0) > 8, "amplitude bins should populate")
  }

  test("PNG encode/decode round-trip: histogram equals direct computation") {
    val seed = Array.tabulate(32)(i => (i * 37 + 5).toByte)
    val png = MultiModal.pngEncode(seed, 12, 9)
    val viaPng = MultiModal.decodeImage(png)
    // direct luminance histogram from the same pixel formula, no codec
    val direct = new Array[Int](16)
    var i = 0
    for (_ <- 0 until 9; _ <- 0 until 12) {
      val v = seed(i % seed.length) & 0xff
      val (r, g, b) = (v, (v * 7) & 0xff, (v * 13) & 0xff)
      val lum = (0.299 * r + 0.587 * g + 0.114 * b).toInt.min(255)
      direct(lum >> 4) += 1
      i += 1
    }
    assert(viaPng.toSeq == direct.toSeq)
    assert(viaPng.sum == 12 * 9)
  }

  test("Y4M encode/decode round-trip: header, planes, histogram") {
    val seed = Array.tabulate(32)(i => (i * 23 + 7).toByte)
    val bytes = graft.mm.Y4m.encode(seed, 16, 10, 4, fpsNum = 25)
    val vid = graft.mm.Y4m.decode(bytes)
    assert((vid.width, vid.height, vid.fpsNum, vid.fpsDen) == (16, 10, 25, 1))
    assert(vid.chroma == "420jpeg" && vid.frames.length == 4)
    // every decoded plane equals the deterministic generator output
    vid.frames.zipWithIndex.foreach { case (f, i) =>
      val g = graft.mm.Y4m.framePlanes(seed, i, 16, 10)
      assert(f.y.toSeq == g.y.toSeq && f.u.toSeq == g.u.toSeq &&
        f.v.toSeq == g.v.toSeq)
      assert(f.y.length == 160 && f.u.length == 40 && f.v.length == 40)
    }
    // luma histogram equals the codec-free direct computation
    val direct = new Array[Int](16)
    (0 until 4).foreach(i => graft.mm.Y4m.framePlanes(seed, i, 16, 10)
      .y.foreach(b => direct((b & 0xff) >> 4) += 1))
    assert(MultiModal.decodeVideo(bytes).toSeq == direct.toSeq)
    assert(direct.sum == 16 * 10 * 4)
    // malformed streams are rejected, not misparsed
    intercept[IllegalArgumentException](graft.mm.Y4m.decode(
      "JUNK W16 H10\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](graft.mm.Y4m.decode(
      bytes.dropRight(10))) // truncated final frame
    intercept[IllegalArgumentException](graft.mm.Y4m.decode(
      "YUV4MPEG2 W16 H10 F25\nFRAME\n".getBytes("US-ASCII"))) // F w/o colon
    intercept[IllegalArgumentException](graft.mm.Y4m.decode(
      "YUV4MPEG2 W16 H10 F0:1\nFRAME\n".getBytes("US-ASCII"))) // zero fps
  }

  test("feature extraction: histogram sums to pixel/byte count, deterministic") {
    val f = MultiModal.extractFeatures(MultiModal.assets(spark, dir))
      .orderBy("asset_id").collect()
    assert(f.length == 500)
    val metaByid = MultiModal.assets(spark, dir)
      .select(col("asset_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    f.take(30).foreach { r =>
      val hist = r.getSeq[Int](2)
      assert(hist.length == 16)
      r.getString(1) match {
        case "image" =>
          val (w, h) = metaByid(r.getLong(0))
          assert(hist.sum == w * h) // one histogram entry per decoded pixel
        case "audio" =>
          // one entry per decoded 16-bit sample (500 + len % 2000)
          assert(hist.sum >= 500 && hist.sum < 2500)
        case _ =>
          // one entry per decoded luma pixel: w*h per frame, 3-8 frames
          val (w, h) = metaByid(r.getLong(0))
          assert(hist.sum % (w * h) == 0)
          assert(hist.sum / (w * h) >= 3 && hist.sum / (w * h) <= 8)
      }
      val e = r.getDouble(3)
      assert(e >= 0.0 && e <= 4.0) // 16 buckets -> max 4 bits
    }
    val f2 = MultiModal.extractFeatures(MultiModal.assets(spark, dir))
      .orderBy("asset_id").collect()
    assert(f.toSeq == f2.toSeq)
  }

  test("frame sampling: every 2nd decoded Y4M frame of video assets") {
    val perVid = MultiModal.assets(spark, dir)
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("meta.duration_ms")).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1) * MultiModal.VideoFps / 1000)) // nFrames back out
    val frames = MultiModal.sampleFrames(MultiModal.assets(spark, dir))
      .groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perVid.foreach { case (id, nf) =>
      assert(frames(id) == (nf + 1) / 2, s"asset $id: $nf frames") // ceil(nf/2)
    }
    val all = MultiModal.sampleFrames(MultiModal.assets(spark, dir))
    assert(all.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    assert(all.filter(length(col("frame_digest")) =!= 16).count() == 0)
  }

  test("image resize: decode-rescale-reencode round trip holds dims") {
    val resized = MultiModal.resizeImages(MultiModal.assets(spark, dir), 8, 8)
    val rows = resized.collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
    // resizing is deterministic (oracle base dump depends on it)
    val e1 = MultiModal.resizeStats(spark, dir).collect().toSeq
    val e2 = MultiModal.resizeStats(spark, dir).collect().toSeq
    assert(e1 == e2)
  }

  test("mm queries run and are non-empty") {
    MultiModal.queries.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() > 0, name)
    }
  }
}
