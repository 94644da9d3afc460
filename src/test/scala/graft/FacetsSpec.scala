package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** Declarative facet API over the KG triple table. */
class FacetsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-facets-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("facetedData: one row per typed doc, facet columns populated") {
    val tr = KgQueries.ctx(spark).triples
    val fd = Facets.facetedData(tr, Facets.defaultFacets)
    assert(fd.count() == KgQueries.MixedN)
    assert(fd.filter(col("title").isNull).count() == 0)
    // issued exists only on the RFC family (md/html carry no date header)
    assert(fd.filter(col("issued").isNull).count() == KgQueries.MixedN - KgQueries.N)
    // issued selector gives a 4-digit year (null on non-RFC families)
    val years = fd.filter(col("issued").isNotNull)
      .select(substring(col("issued"), 1, 4)).distinct()
      .collect().map(_.getString(0))
    assert(years.forall(_.matches("\\d{4}")))
  }

  test("tocPageSets: pages partition the docs per facet, deterministic") {
    val tr = KgQueries.ctx(spark).triples
    val fd = Facets.facetedData(tr, Facets.defaultFacets)
    val toc = Facets.tocPageSets(fd, Facets.defaultFacets).collect()
    assert(toc.nonEmpty)
    val byFacet = toc.groupBy(_.getString(0))
    // every toc facet's page doc-counts sum to the corpus size
    Seq("publisher", "issued", "category").foreach { f =>
      // publisher/issued/category facets exist only on the RFC family
      assert(byFacet(f).map(_.getLong(2)).sum == KgQueries.N, f)
    }
    // identificators follow the reference's defaultidentificator contract
    // (facet.py:143-154: lower().replace(" ","-") — non-ASCII passes
    // through, so sv/de accented titles keep å/ä/ö here)
    assert(toc.forall(r => {
      val s = r.getString(1)
      !s.contains(" ") && s == s.toLowerCase
    }))
  }

  test("makeSchema: typed fields derived from facets; conflicts rejected") {
    import graft.model.Vocab
    // single repo: default schema + one typed field per facet binding
    val schema = Facets.makeSchema(Seq("rfc" -> Facets.searchFacets))
    assert(schema("uri") == Facets.Identifier)   // default fields kept
    assert(schema("text") == Facets.Text())
    assert(schema("title") == Facets.Text(4.0))
    assert(schema("identifier") == Facets.Text(2.0))
    assert(schema("issued") == Facets.DateTime)
    assert(schema("publisher") == Facets.Label)

    // two repos sharing a field with the SAME type: allowed
    val repoB = Seq(Facets.Facet(Vocab.dcterms("title"), "title",
      indexingType = Facets.Text(4.0)))
    assert(Facets.makeSchema(
      Seq("rfc" -> Facets.searchFacets, "b" -> repoB))("title")
      == Facets.Text(4.0))

    // two repos sharing a field with DIFFERENT types: SchemaConflictError
    val repoC = Seq(Facets.Facet(Vocab.dcterms("title"), "title",
      indexingType = Facets.Label))
    val e = intercept[Facets.SchemaConflictError] {
      Facets.makeSchema(Seq("rfc" -> Facets.searchFacets, "c" -> repoC))
    }
    assert(e.getMessage.contains("title"))
  }

  test("boostFor: the boosted-search weights come from the facet schema") {
    import graft.model.Vocab
    val boosts = Facets.boostFor(Facets.searchFacets)
    assert(boosts(Vocab.dcterms("title")) == 4.0)
    assert(boosts(Vocab.dcterms("identifier")) == 2.0)
    assert(boosts(Vocab.dcterms("publisher")) == 1.0)
  }
}
