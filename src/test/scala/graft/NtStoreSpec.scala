package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.model.Triple
import graft.kg.NtStore

/** N-Triples codec: ingest of the reference's own RDF fixture dumps and
  * round-trip stability. */
class NtStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-nt-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val fixtures = "/root/reference/test/files/datasets"

  test("fromNt: URIs, plain/lang/datatype literals, numeric escapes") {
    val t1 = Triple.fromNt(
      """<http://a> <http://b> <http://c> .""").get
    assert(!t1.objIsLiteral && t1.obj == "http://c")
    val t2 = Triple.fromNt(
      """<http://a> <http://b> "företag"@sv .""").get
    assert(t2.obj == "företag" && t2.objLang.contains("sv"))
    val t3 = Triple.fromNt(
      """<http://a> <http://b> "2012-04-26"^^<http://www.w3.org/2001/XMLSchema#date> .""").get
    assert(t3.objDatatype.contains("http://www.w3.org/2001/XMLSchema#date"))
    val t4 = Triple.fromNt("""<http://a> <http://b> "say \"hi\"\n" .""").get
    assert(t4.obj == "say \"hi\"\n")
    assert(Triple.fromNt("").isEmpty && Triple.fromNt("# comment").isEmpty)
  }

  test("ingest the reference's dataset.nt fixtures; round-trip is stable") {
    assume(new java.io.File(fixtures).isDirectory)
    import spark.implicits._
    for (f <- Seq("dataset.nt", "dataset2.nt", "annotations-rfc.nt")) {
      val path = s"$fixtures/$f"
      val nLines = scala.io.Source.fromFile(path, "UTF-8").getLines()
        .count(_.trim.nonEmpty)
      val df = NtStore.read(spark, path)
      assert(df.count() == nLines, f)
      // round-trip at the triple level: serialize + reparse = identity
      val back = df.as[Triple].collect()
        .map(t => Triple.fromNt(Triple.toNt(t)).get.copy(graph = t.graph))
      assert(back.toSet == df.as[Triple].collect().toSet, f)
    }
    // decoded content spot checks (escapes, lang, datatype from the dump)
    val ds = NtStore.read(spark, s"$fixtures/dataset.nt").as[Triple].collect()
    assert(ds.exists(t => t.obj.contains("förenklat") && t.objLang.contains("sv")))
    assert(ds.exists(t => t.objDatatype.exists(_.endsWith("#date"))))
  }
}
