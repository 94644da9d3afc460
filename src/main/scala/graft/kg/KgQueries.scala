package graft.kg

import graft.model.Vocab
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The KG query surface: the reference's three SPARQL shapes (SURVEY.md
  * §2.7) plus the pipeline's own tables, exposed as SparkEntry `queries`
  * entries. Inputs are the deterministic synthetic corpus (BASELINE.json:
  * the KG runs over the Iceberg-shaped source table, not the TPC-H data),
  * so these are rows-only checks for the driver; their semantics are
  * oracle-tested in ScalaTest (KgSpec/KgQueriesSpec) instead.
  *
  * All outputs are deterministically ordered.
  */
object KgQueries {

  final val N = 150L
  final val Seed = 42L

  /** One pipeline execution per SparkSession, shared across queries
    * (Verify runs queries sequentially on one session). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Ctx]()

  final case class Ctx(
      docs: DataFrame,
      triples: DataFrame,
      mentions: DataFrame,
      linked: DataFrame,
      canon: DataFrame)

  def ctx(spark: SparkSession): Ctx =
    cache.computeIfAbsent(spark, { s =>
      import s.implicits._
      val input = KgPipeline.synthesizeInput(s, N, Seed)
      val parsed = KgStages.parseStage(input).persist()
      val docs = KgStages.docsDf(parsed)
      val docTriples0 = KgStages.docTriplesDf(parsed)
      val mentions = KgStages.mentionsDf(parsed)
      val dict = KgStages.entityDictionary(docTriples0)
      val linked = KgStages.linkStage(mentions, dict).persist()
      val linkTriples = KgStages.linkTriplesDf(linked)
      val docTriples = KgStages.fuzzyUpgrade(docTriples0,
        EntityDict.publishers, Seq(Vocab.dcterms("publisher")))
      val sameAs = s.createDataFrame(Corpus.sameAsEdges(Seed, N))
        .toDF("src", "dst")
      val (curatedRaw, _) = Corpus.aliasTriples(Seed, N)
      val curated = s.createDataset(curatedRaw).toDF()
      val canon = KgPipeline.canonMap(Cc.connectedComponents(sameAs)).persist()
      val triples = KgStages.materialize(docTriples, linkTriples, curated, canon)
        .persist()
      Ctx(docs.persist(), triples, mentions.persist(), linked, canon)
    })

  private def t(c: Ctx) = c.triples

  /** Final materialized triple table (deterministic order). */
  def pipelineTriples(spark: SparkSession, dir: String): DataFrame =
    t(ctx(spark)).orderBy("subj", "pred", "obj", "graph")

  /** Facet SELECT (facet_query, documentrepository.py:2293-2383):
    * `SELECT ?uri ?title ?publisher ?issued ?category WHERE { ?uri a rfc:* .
    * OPTIONAL ... }` as filter + pivot-by-join over the triple table. */
  def facetPivot(spark: SparkSession, dir: String): DataFrame = {
    val tr = t(ctx(spark))
    val typed = tr.filter(col("pred") === Vocab.RDF_TYPE &&
        col("obj").startsWith(Vocab.RFC_NS))
      .select(col("subj").as("uri"), col("obj").as("rdf_type"))
    def facetCol(pred: String, name: String) =
      tr.filter(col("pred") === pred)
        .groupBy(col("subj").as("uri"))
        .agg(min(col("obj")).as(name)) // min = deterministic pick
    typed
      .join(facetCol(Vocab.dcterms("title"), "title"), Seq("uri"), "left")
      .join(facetCol(Vocab.dcterms("publisher"), "publisher"), Seq("uri"), "left")
      .join(facetCol(Vocab.dcterms("issued"), "issued"), Seq("uri"), "left")
      .join(facetCol(Vocab.dcterms("subject"), "category"), Seq("uri"), "left")
      .dropDuplicates("uri")
      .orderBy("uri")
  }

  /** Dataset stats (wsgiapp.py:232-386): distinct documents per facet
    * observation — publisher and issued-year dimensions unioned. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val fac = facetPivot(spark, dir)
    val byPub = fac.filter(col("publisher").isNotNull)
      .select(lit("publisher").as("dimension"), col("publisher").as("value"),
        col("uri"))
    val byYear = fac.filter(col("issued").isNotNull)
      .select(lit("year").as("dimension"),
        substring(col("issued"), 1, 4).as("value"), col("uri"))
    byPub.unionByName(byYear)
      .distinct()
      .groupBy("dimension", "value")
      .agg(countDistinct("uri").as("n_docs"))
      .orderBy("dimension", "value")
  }

  /** Annotations CONSTRUCT (rfc-annotations.rq:1-39): for every document,
    * the incoming dcterms:references edges (who cites me), incoming
    * rfc:updates / rfc:obsoletes, and the transitive dcterms:isPartOf*
    * closure of the citing sections — the property-path fixpoint done as an
    * iterative self-join (SURVEY.md §2.7). */
  def annotations(spark: SparkSession, dir: String): DataFrame = {
    val tr = t(ctx(spark)).persist()
    // isPartOf closure: section -> owning document (paths are depth <= 3)
    val part = tr.filter(col("pred") === Vocab.dcterms("isPartOf"))
      .select(col("subj").as("child"), col("obj").as("parent"))
      .localCheckpoint() // fixpoint loop below re-reads this many times
    var closure = part
    var next = closure.as("a")
      .join(part.as("b"), col("a.parent") === col("b.child"))
      .select(col("a.child").as("child"), col("b.parent").as("parent"))
      .localCheckpoint()
    var rounds = 0
    while (rounds < 4 && next.limit(1).count() > 0) {
      closure = closure.unionByName(next).distinct().localCheckpoint()
      next = next.as("a")
        .join(part.as("b"), col("a.parent") === col("b.child"))
        .select(col("a.child").as("child"), col("b.parent").as("parent"))
        .localCheckpoint()
      rounds += 1
    }
    val roots = closure.join(
      part.select(col("parent").as("p")).distinct()
        .join(part.select(col("child").as("p")).distinct(), Seq("p"), "left_semi"),
      col("parent") === col("p"), "left_anti") // keep only top-level parents
    val refs = tr.filter(col("pred") === Vocab.dcterms("references"))
      .select(col("subj").as("citingPart"), col("obj").as("target"))
    // citing section resolved to its owning document
    val citingDoc = refs.join(roots,
        refs("citingPart") === roots("child"), "left")
      .select(col("target"),
        coalesce(col("parent"), col("citingPart")).as("citingDoc"))
    val updates = tr.filter(col("pred").isin(
        Vocab.rfc("updates"), Vocab.rfc("obsoletes")))
      .select(col("obj").as("target"), col("pred"), col("subj").as("source"))
    val annIn = citingDoc.groupBy("target")
      .agg(countDistinct("citingDoc").as("n_citing_docs"))
    val annUp = updates.groupBy("target")
      .agg(sum(when(col("pred") === Vocab.rfc("updates"), 1).otherwise(0))
             .as("n_updated_by"),
           sum(when(col("pred") === Vocab.rfc("obsoletes"), 1).otherwise(0))
             .as("n_obsoleted_by"))
    annIn.join(annUp, Seq("target"), "full")
      .na.fill(0)
      .orderBy("target")
  }

  /** Reverse-dependency edges (relate_dependencies). */
  def deps(spark: SparkSession, dir: String): DataFrame =
    KgStages.depsDf(ctx(spark).linked).orderBy("target")

  /** Skeleton entities: URIs referenced but never defined
    * (skeleton.py:17-44). */
  def skeleton(spark: SparkSession, dir: String): DataFrame =
    KgStages.skeletonDf(ctx(spark).linked).orderBy("uri")

  /** Canonicalization map (aliased URIs only). */
  def canonMap(spark: SparkSession, dir: String): DataFrame =
    ctx(spark).canon.orderBy("uri")

  /** TOC pageset (documentrepository.py:2855-2995): documents grouped by
    * first letter of the title sortkey, with per-page document counts and
    * a deterministic first member. */
  def tocPages(spark: SparkSession, dir: String): DataFrame = {
    val fac = facetPivot(spark, dir)
    val sortkey = regexp_replace(
      regexp_replace(lower(trim(col("title"))), "^the ", ""), "[^a-z0-9 ]", "")
    fac.filter(col("title").isNotNull)
      .withColumn("letter", substring(regexp_replace(sortkey, " ", ""), 1, 1))
      .groupBy("letter")
      .agg(count(lit(1)).as("n_docs"),
        min(col("uri")).as("first_uri"))
      .orderBy("letter")
  }

  /** News feed (news_select_for_feeds, documentrepository.py:3322-3377):
    * newest 10 documents by issued date per publisher feed. */
  def newsFeeds(spark: SparkSession, dir: String): DataFrame = {
    val fac = facetPivot(spark, dir)
    val w = Window.partitionBy(col("publisher"))
      .orderBy(col("issued").desc, col("uri").asc)
    fac.filter(col("publisher").isNotNull && col("issued").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("publisher", "rk", "uri", "issued", "title")
      .orderBy("publisher", "rk")
  }

  /** Per-partition lineage metrics of the parse stage (north_rule:
    * per-partition lineage + metrics). */
  def lineage(spark: SparkSession, dir: String): DataFrame =
    KgStages.lineageDf(ctx(spark).docs, "parse", "verify")
      .drop("committedAt")
      .orderBy("repo", "lang")

  /** required_predicates validation (documentrepository.py:311-317,
    * decorators.py:231-236): every doc must carry rdf:type, dcterms:title
    * and dcterms:identifier — emit one row per doc with presence flags and
    * a violation marker (expected: zero violations on the corpus). */
  def requiredPredicates(spark: SparkSession, dir: String): DataFrame = {
    val tr = t(ctx(spark))
    val docsUris = ctx(spark).docs.select(col("uri")).distinct()
    val checks = Seq(
      Vocab.RDF_TYPE -> "has_type",
      Vocab.dcterms("title") -> "has_title",
      Vocab.dcterms("identifier") -> "has_identifier")
    val flagged = checks.foldLeft(docsUris) { case (acc, (pred, name)) =>
      acc.join(
        tr.filter(col("pred") === pred).select(col("subj").as("uri"))
          .distinct().withColumn(name, lit(true)),
        Seq("uri"), "left")
    }
    flagged.na.fill(false)
      .withColumn("violation",
        !(col("has_type") && col("has_title") && col("has_identifier")))
      .groupBy("violation")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("violation")
  }

  /** Keyword hub entities (sources/general/keyword.py:43-80): one entity
    * per distinct dcterms:subject value across the dataset. */
  def keywordEntities(spark: SparkSession, dir: String): DataFrame =
    t(ctx(spark))
      .filter(col("pred") === Vocab.dcterms("subject") && !col("objIsLiteral"))
      .select(col("obj").as("uri")).distinct()
      .withColumn("label",
        graft.functions.Selectors.uriLeaf(col("uri")))
      .orderBy("uri")

  /** dump.nt export head (documentrepository.py:1813-1883): the triple
    * table rendered as N-Triples text lines; deterministic first 100. */
  def ntExport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = t(ctx(spark))
      .na.fill("", Seq("objDatatype", "objLang"))
      .select("subj", "pred", "obj", "objIsLiteral", "objDatatype", "objLang")
      .as[(String, String, String, Boolean, String, String)]
      .map { case (s, p, o, isLit, dt, lang) =>
        graft.model.Triple.toNt(graft.model.Triple(s, p, o, isLit,
          Option(dt).filter(_.nonEmpty), Option(lang).filter(_.nonEmpty), ""))
      }
    rows.toDF("nt").orderBy("nt").limit(100)
  }

  /** Natural-ordinal section listing (util.numcmp semantics, SURVEY §2.5):
    * sections of one document ordered "1, 2, 2.1, 2.2, 10" not
    * lexicographically. */
  def sectionNaturalOrder(spark: SparkSession, dir: String): DataFrame = {
    val tr = t(ctx(spark))
    tr.filter(col("pred") === Vocab.dcterms("identifier") &&
        col("subj").contains("#S"))
      .select(col("subj"), col("obj").as("identifier"))
      .withColumn("sortkey",
        graft.functions.Selectors.naturalSortKey(col("identifier")))
      .orderBy("sortkey", "subj")
      .limit(200)
  }

  /** REST-search surface (wsgiapp.py:388-433 + fulltextindex term query):
    * term match over titles with a tf-ish score, paginated. No search
    * engine — the faceted table IS the index (SURVEY §1.1). */
  def search(spark: SparkSession, dir: String,
             term: String = "protocol", pageLen: Int = 10): DataFrame = {
    val fac = facetPivot(spark, dir)
    val norm = lower(col("title"))
    fac.filter(norm.contains(term))
      .withColumn("score",
        (length(norm) - length(regexp_replace(norm, term, ""))) / term.length)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("uri").asc)))
      .withColumn("page", ceil(col("rk") / pageLen.toDouble).cast("int"))
      .select("rk", "page", "uri", "title", "score")
      .orderBy("rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_pipeline_triples" -> pipelineTriples,
    "kg_facet_pivot" -> facetPivot,
    "kg_stats" -> stats,
    "kg_annotations" -> annotations,
    "kg_deps" -> deps,
    "kg_skeleton" -> skeleton,
    "kg_canon_map" -> canonMap,
    "kg_toc_pages" -> tocPages,
    "kg_news_feeds" -> newsFeeds,
    "kg_lineage" -> lineage,
    "kg_required_predicates" -> requiredPredicates,
    "kg_keyword_entities" -> keywordEntities,
    "kg_nt_export" -> ntExport,
    "kg_section_natural_order" -> sectionNaturalOrder,
    "kg_search" -> ((s, d) => search(s, d)),
  )
}
