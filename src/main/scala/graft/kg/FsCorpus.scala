package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.parse.MyndFskr

/** Distributed execution surface for the [[graft.parse.MyndFskr]]
  * chain: a deterministic corpus of agency-regulation texts is
  * synthesized EXECUTOR-SIDE (a pure function of the index, the
  * KgPipeline.synthesizeInput discipline), the REAL sanitize → extract
  * → sanitize → polish chain runs per document as a narrow map (no
  * shuffle — the 100 TB shape: regulation PDFs parse embarrassingly
  * parallel), and the flattened property row is the query output. The
  * DuckDB oracle re-derives every expected value from the PLANTING
  * formulas (the text_pii_redact pattern) — identifier, title, the
  * Swedish-prose dates, the LAGRUM-parsed bemyndigande URI, the
  * repeal target — so a regression anywhere in the regex tables, the
  * date parser, the citation parser, or the URI minting mismatches.
  * The chain itself is additionally golden-tested against all 19 of
  * the reference's own fixture pairs (MyndFskrGoldenSpec). */
object FsCorpus {

  final val N = 240L

  private val SerieUri = "http://rinfo.lagrummet.se/serie/fs/testfs"
  private val OrgUri = "http://rinfo.lagrummet.se/org/testmyndigheten"

  /** Synthetic commondata for the synthetic series — production
    * supplies its real resource graph the same way. */
  val resources: MyndFskr.Resources = MyndFskr.Resources(
    fsByAltLabel = Map("TESTFS" -> SerieUri),
    fsPublisher = Map(SerieUri -> OrgUri),
    orgByName = Map("Testmyndigheten" -> OrgUri))

  private val monthNames = Vector("januari", "februari", "mars", "april",
    "maj", "juni", "juli", "augusti", "september", "oktober", "november",
    "december")

  /** One regulation text — every planted value is a pure function of
    * `i`, replayed by the oracle. Every 5th document is an upphävande
    * (repeal) act whose title carries the repealed act's id. */
  def text(i: Long): String = {
    val year = 1990 + (i % 30)
    val no = 1 + (i % 97)
    val day = 1 + (i % 28)
    val month = monthNames((i % 12).toInt)
    val ikraftYear = year + 1
    val sfsY = 1970 + (i % 40)
    val sfsN = 100 + (i % 900)
    val p = 1 + (i % 30)
    val subject =
      if (i % 5 == 0)
        s"upphävande av föreskrifterna (TESTFS ${1990 + (i % 7)}:${1 + (i % 9)}) om ämne $no"
      else s"ämne $no"
    s"""TESTFS $year:$no

Testmyndighetens föreskrifter om $subject;
beslutade den $day $month $year.

Testmyndigheten föreskriver med stöd av $p § förordningen ($sfsY:$sfsN) att följande ska gälla.

1 § Dessa föreskrifter innehåller bestämmelser om ämne $no.

Denna författning träder i kraft den 1 juli $ikraftYear.
"""
  }

  /** One row per parsed document: the polish-step triples flattened to
    * the columns the oracle replays. */
  def fsProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dct = graft.model.Vocab.dcterms _
    val rp = graft.model.Vocab.rpubl _
    spark.range(0, N, 1, spark.sparkContext.defaultParallelism)
      .map { i =>
        val year = 1990 + (i % 30)
        val no = 1 + (i % 97)
        val basefile = s"testfs/$year:$no"
        val (uri, triples) = MyndFskr.parse(text(i), basefile, resources)
        def one(pred: String): Option[String] =
          triples.collectFirst { case t if t.pred == pred => t.obj }
        (i, uri,
          one(dct("identifier")).getOrElse(""),
          one(dct("title")).getOrElse(""),
          one(rp("beslutsdatum")).getOrElse(""),
          one(rp("ikrafttradandedatum")).getOrElse(""),
          one(rp("bemyndigande")).getOrElse(""),
          one(rp("upphaver")).orNull,
          one(dct("publisher")).getOrElse(""))
      }
      .toDF("doc_id", "uri", "identifier", "title", "beslutsdatum",
        "ikraft", "bemyndigande", "upphaver", "publisher")
      .orderBy("doc_id")
  }

  /** The oracle replays the planting formulas in SQL — shared here so
    * the month-name table cannot drift between the generator and the
    * replay. */
  val oracleSql: String = {
    val monthCase = monthNames.zipWithIndex.map { case (m, idx) =>
      s"WHEN ${idx + 1} THEN '$m'"
    }.mkString(" ")
    s"""WITH g AS (
         SELECT i AS doc_id,
           1990 + (i % 30) AS y, 1 + (i % 97) AS n,
           1 + (i % 28) AS d, 1 + (i % 12) AS mo,
           1970 + (i % 40) AS sfsy, 100 + (i % 900) AS sfsn,
           1 + (i % 30) AS p,
           1990 + (i % 7) AS upy, 1 + (i % 9) AS upn,
           (i % 5 = 0) AS repeal
         FROM range(0, ${N}) t(i))
       SELECT doc_id,
         'http://rinfo.lagrummet.se/publ/testfs/' || y || ':' || n AS uri,
         'TESTFS ' || y || ':' || n AS identifier,
         'Testmyndighetens föreskrifter om ' ||
           CASE WHEN repeal THEN 'upphävande av föreskrifterna (TESTFS '
               || upy || ':' || upn || ') om ämne ' || n
             ELSE 'ämne ' || n END AS title,
         y || '-' || lpad(mo::VARCHAR, 2, '0') || '-'
           || lpad(d::VARCHAR, 2, '0') AS beslutsdatum,
         (y + 1) || '-07-01' AS ikraft,
         'http://rinfo.lagrummet.se/publ/sfs/' || sfsy || ':' || sfsn
           || '#p_' || p AS bemyndigande,
         CASE WHEN repeal
           THEN 'http://rinfo.lagrummet.se/publ/testfs/' || upy || ':' || upn
         END AS upphaver,
         'http://rinfo.lagrummet.se/org/testmyndigheten' AS publisher
       FROM g ORDER BY doc_id"""
  }
}
