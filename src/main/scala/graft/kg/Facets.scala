package graft.kg

import graft.functions.Selectors
import graft.model.Vocab
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative facet API — the reference's `facets()` surface
  * (/root/reference/ferenda/facet.py:348-422): a facet is (rdf predicate,
  * selector, identificator, sort key, multi-valuedness, toc/feed flags). A
  * ferenda repo's facet list ports 1:1; the engine compiles the list into
  * one pivot plan over the triple table plus per-facet grouping queries
  * (facet_query semantics, documentrepository.py:2293-2383).
  */
object Facets {

  final case class Facet(
      pred: String,
      /** column name in the faceted table (the SPARQL binding name) */
      binding: String,
      /** selector: faceted column → group value (facet.py:128-177) */
      selector: Column => Column = identity,
      /** identificator: group value → URL-safe key (facet.py:142-154) */
      identificator: Column => Column = Selectors.defaultIdentificator,
      /** key for ordering docs within a group (facet.py:195-210) */
      sortKey: Column => Column = Selectors.titleSortKey,
      multipleValues: Boolean = false,
      useForToc: Boolean = true)

  /** The reference's stock facet set for an RFC-like repo
    * (rdf:type, dcterms:title, dcterms:publisher, dcterms:issued year,
    * dcterms:subject — rfc.py facets + facet.py defaults). */
  val defaultFacets: Seq[Facet] = Seq(
    Facet(Vocab.RDF_TYPE, "rdf_type", selector = Selectors.uriLeaf(_)),
    Facet(Vocab.dcterms("title"), "title"),
    Facet(Vocab.dcterms("publisher"), "publisher",
      selector = Selectors.uriLeaf(_)),
    Facet(Vocab.dcterms("issued"), "issued",
      selector = c => substring(c, 1, 4)), // year of gYearMonth/date
    Facet(Vocab.dcterms("subject"), "category",
      selector = Selectors.uriLeaf(_)))

  /** faceted_data (documentrepository.py:2235-2291): one row per document
    * URI with one column per facet — filter + per-predicate aggregation
    * joins (multi-valued facets keep arrays; single pick min for
    * determinism). */
  def facetedData(triples: DataFrame, facets: Seq[Facet],
                  typeFilter: Column => Column = _.startsWith(Vocab.RFC_NS))
      : DataFrame = {
    val typed = triples
      .filter(col("pred") === Vocab.RDF_TYPE && typeFilter(col("obj")))
      .select(col("subj").as("uri")).distinct()
    facets.filter(_.pred != Vocab.RDF_TYPE).foldLeft(
      typed.join(
        triples.filter(col("pred") === Vocab.RDF_TYPE)
          .groupBy(col("subj").as("uri"))
          .agg(min(col("obj")).as("rdf_type")),
        Seq("uri"), "left")) { (acc, f) =>
      val colDf =
        if (f.multipleValues)
          triples.filter(col("pred") === f.pred)
            .groupBy(col("subj").as("uri"))
            .agg(sort_array(collect_set(col("obj"))).as(f.binding))
        else
          triples.filter(col("pred") === f.pred)
            .groupBy(col("subj").as("uri"))
            .agg(min(col("obj")).as(f.binding))
      acc.join(colDf, Seq("uri"), "left")
    }
  }

  /** toc_pagesets + toc_select_for_pages (documentrepository.py:2855-2995):
    * per facet, distinct selector values with doc counts and the first
    * sortKey-ordered member per page. */
  def tocPageSets(faceted: DataFrame, facets: Seq[Facet]): DataFrame = {
    val pages = facets.filter(f => f.useForToc && f.binding != "rdf_type")
      .map { f =>
        val sel = f.selector(col(f.binding))
        faceted.filter(col(f.binding).isNotNull)
          .select(
            lit(f.binding).as("facet"),
            f.identificator(sel).as("page"),
            col("uri"),
            f.sortKey(coalesce(col("title"), col("uri"))).as("sk"))
      }
    pages.reduce(_ unionByName _)
      .groupBy("facet", "page")
      .agg(count(lit(1)).as("n_docs"),
        min(struct(col("sk"), col("uri"))).as("first"))
      .select(col("facet"), col("page"), col("n_docs"),
        col("first.uri").as("first_uri"))
      .orderBy("facet", "page")
  }
}
