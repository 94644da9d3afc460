package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.parse.PdfReader
import graft.pdf.{PdfAnalyzer, PdfOps}

/** The distributed PDF operators: the analyzer-metrics query agrees
  * with a direct driver-side PdfAnalyzer run, and the hOCR corpus
  * exercises every parse rule the oracle re-derives. */
class PdfOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-pdfops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("pdf_analyze_metrics matches a driver-side analyzer run per doc") {
    val rows = PdfOps.analyzeMetrics(spark, "").collect()
    assert(rows.length == PdfOps.NDocs)
    for (d <- Seq(0, 7, 23, PdfOps.NDocs - 1)) {
      val pdf = PdfReader.parseXml(PdfOps.artifact(d))
      val (ints, styles, _) = new PdfAnalyzer(pdf).metrics()
      val r = rows.find(_.getLong(0) == d).get
      assert(r.getInt(r.fieldIndex("leftmargin")) == ints("leftmargin"))
      assert(r.getInt(r.fieldIndex("rightmargin")) == ints("rightmargin"))
      assert(r.getInt(r.fieldIndex("topmargin")) == ints("topmargin"))
      assert(r.getInt(r.fieldIndex("bottommargin")) ==
        ints("bottommargin"))
      assert(r.getString(r.fieldIndex("default_family")) ==
        styles("default")._1)
    }
    // margins vary across the corpus (the oracle isn't matching a
    // constant)
    assert(rows.map(_.getInt(6)).distinct.length > 1) // bottommargin
  }

  test("hOCR corpus exercises sup, tags, skipped words, varying scale") {
    val docs = (0 until PdfOps.HDocs).map(d =>
      PdfReader.parseHocr(PdfOps.hocrArtifact(d)))
    val boxes = docs.flatMap(_.pages.flatMap(_.boxes))
    assert(boxes.nonEmpty)
    // sup markers present (small leading digit) and absent on
    // normal-height digit lines
    val sups = boxes.filter(_.els.head.tag.contains("sup"))
    assert(sups.nonEmpty)
    val digitsNoSup = boxes.filter(b =>
      b.els.head.tag.isEmpty && b.els.head.text.trim.forall(_.isDigit) &&
        b.els.head.text.trim.nonEmpty)
    assert(digitsNoSup.nonEmpty)
    // italic/bold word tags survive
    assert(boxes.exists(_.els.exists(_.tag.contains("i"))))
    assert(boxes.exists(_.els.exists(_.tag.contains("b"))))
    // whitespace-only words were skipped: every element trims nonempty
    assert(boxes.forall(_.els.forall(_.text.trim.nonEmpty)))
    // page scale factors genuinely vary: the same 72px word height
    // lands on different point sizes across the corpus (page pt
    // height is ~842 by construction — each page scales by its own
    // bbox against the A4 assumption)
    assert(docs.flatMap(_.fontspec.values.map(_.size)).distinct
      .count(_ > 20) > 1)
  }

  test("pdf_hocr_lines: one row per parsed line, parity with parseHocr") {
    val rows = PdfOps.hocrLines(spark, "").collect()
    val direct = (0 until PdfOps.HDocs).flatMap { d =>
      val pdf = PdfReader.parseHocr(PdfOps.hocrArtifact(d))
      pdf.pages.flatMap(p => p.boxes.map(b => (d.toLong, p.number, b)))
    }
    assert(rows.length == direct.length)
    val byKey = rows.map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)),
      r)).toMap
    direct.groupBy(t => (t._1, t._2)).foreach { case ((d, pg), bs) =>
      bs.zipWithIndex.foreach { case ((_, _, b), i) =>
        val r = byKey((d, pg, i + 1))
        assert(r.getInt(r.fieldIndex("top")) == b.top)
        assert(r.getString(r.fieldIndex("text")) == b.text)
        assert(r.getDouble(r.fieldIndex("confidence")) ==
          b.confidence.get)
      }
    }
  }
}
