package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._
import graft.model.Vocab
import graft.parse.{DocParsers, MdDoc}

/** Second document family (markdown READMEs): generic-FSM second config,
  * path-based dispatch, cross-family linking, fence masking. */
class MdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-md-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val mdSample =
    """# Sample Guide
      |
      |Intro paragraph here.
      |
      |## Usage
      |
      |See RFC 2616 for details, also http://example.com/x.
      |
      |```scala
      |// RFC 9999 must NOT become a mention
      |```
      |
      |- a list item citing section 4 of RFC 822
      |
      |## Notes
      |
      |Closing words.
      |""".stripMargin

  test("markdown FSM config: structure, section numbering, fence opacity") {
    val src = graft.model.SourceFile("r1", "docs/sample.md", "c0", "en", mdSample)
    val p = DocParsers.parse(src) // dispatch by .md extension
    assert(p.uri == "https://example.org/doc/r1/sample")
    assert(p.title == "Sample Guide")
    val secs = p.triples.filter(t =>
      t.pred == Vocab.RDF_TYPE && t.obj == Vocab.bibo("DocumentPart"))
    assert(secs.map(_.subj).toSet ==
      Set(p.uri + "#S1", p.uri + "#S2"))
    // fence content masked; prose citations found with section subjects
    assert(!p.mentions.exists(_.candidateKey.contains("9999")))
    assert(p.mentions.exists(m =>
      m.candidateKey == "https://example.org/rfc/2616" &&
      m.subjUri == p.uri + "#S1"))
    assert(p.mentions.exists(m =>
      m.candidateKey == "https://example.org/rfc/822#S4" &&
      m.subjUri == p.uri + "#S1"))
    assert(p.mentions.exists(_.candidateKey == "http://example.com/x"))
  }

  test("non-md paths dispatch to the RFC parser") {
    val rfc = Corpus.doc(42L, 3L, 10L)
    val p = DocParsers.parse(rfc.src)
    assert(p.uri.startsWith("https://example.org/rfc/"))
  }

  test("mixed-family pipeline: P/R = 1.0 incl. cross-family links") {
    import spark.implicits._
    val n = 40L
    val rfcDocs = (0L until n).map(Corpus.doc(7L, _, n))
    val mdDocs = (0L until 12L).map(Corpus.mdDoc(7L, _, n))
    val all = rfcDocs ++ mdDocs
    val input = spark.createDataset(all.map(_.src))
    val parsed = KgStages.parseStage(input).persist()
    assert(KgStages.failuresDf(parsed).count() == 0)

    val docTriples0 = KgStages.docTriplesDf(parsed)
    val mentions = KgStages.mentionsDf(parsed)
    val dict = KgStages.entityDictionary(docTriples0)
    val linked = KgStages.linkStage(mentions, dict)
    val linkTriples = KgStages.linkTriplesDf(linked)
    val docTriples = KgStages.fuzzyUpgrade(docTriples0,
      EntityDict.publishers, Seq(Vocab.dcterms("publisher")))
    val actual = docTriples.unionByName(linkTriples)

    val expected = spark.createDataset(all.flatMap(_.truth)).toDF()
    val prf = Scoring.score(actual, expected)
    info(f"mixed-family P=${prf.precision}%.4f R=${prf.recall}%.4f")
    if (prf.fp > 0 || prf.fn > 0)
      Scoring.diff(actual, expected).orderBy("side", "subj", "pred")
        .show(30, 150)
    assert(prf.precision == 1.0 && prf.recall == 1.0,
      f"P=${prf.precision} R=${prf.recall} fp=${prf.fp} fn=${prf.fn}")

    // cross-family: md sections reference RFC-space URIs and resolve
    val cross = linked.filter(col("docId").contains(".md@") &&
      col("candidateKey").startsWith("https://example.org/rfc/") &&
      col("resolved"))
    assert(cross.count() > 0, "no resolved cross-family links")
    parsed.unpersist()
  }
}
