package graft.pdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.parse.PdfReader

/** The PDF reader as a DISTRIBUTED operator: a corpus of pdf2xml
  * intermediate artifacts (the text format poppler's pdftohtml emits —
  * the reference's own test suite drives PDFReader from pre-extracted
  * intermediates exactly like this, never from binary PDFs) parsed
  * per-row, plus the textboxes() glue stream as a driver-verified
  * query.
  *
  * Division of labor, as everywhere in this repo: the per-row parse
  * semantics (tag algebra, footnote markers, whitespace rules,
  * decoders) are covered by PdfReaderSpec's golden parity with the
  * reference's own test suite; the DuckDB oracle re-derives the GLUE
  * segmentation and aggregation RELATIONALLY from the dumped raw-box
  * table — lag()-window boundary detection over the default-glue
  * predicate, cumulative-sum group ids, and an ordered string fold
  * that reproduces Textbox.__add__'s seam rules (space insertion and
  * dehyphenation).
  *
  * At 100 TB the shape holds: artifacts are rows, the parse+glue is a
  * narrow per-row map (no shuffle), and the stats rollups shuffle only
  * the glued summaries.
  */
object PdfOps {

  final val NDocs = 48
  private val Words = Vector("section", "ruling", "statute", "appendix",
    "provision", "court", "agency", "register", "filing", "notice",
    "review", "appeal", "decision", "mandate", "clause", "schedule")

  private def pick(seed: Int, n: Int): String =
    (0 until n).map(i => Words(math.abs(seed * 31 + i * 7) % Words.length))
      .mkString(" ")

  /** One deterministic pdf2xml artifact: two pages, paragraphs of
    * same-left consecutive lines (glue holds), separated by larger
    * gaps (boundary), with a bold-family line inside a paragraph (the
    * basefamily rule), hyphenated line breaks (dehyphenation), and
    * trailing-space lines (no-separator seam). */
  def artifact(doc: Int): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<pdf2xml producer=\"poppler\" version=\"0.56.0\">\n")
    (1 to 2).foreach { page =>
      sb.append(s"""<page number="$page" position="absolute" top="0" """)
      sb.append("left=\"0\" height=\"1263\" width=\"892\">\n")
      sb.append("<fontspec id=\"0\" size=\"16\" family=\"ABCDEF+Cambria\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"1\" size=\"16\" " +
        "family=\"ABCDEF+Cambria-Bold\" color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"2\" size=\"12\" family=\"Arial\"" +
        " color=\"#000000\"/>\n")
      var top = 100
      val nParas = 2 + (doc + page) % 3
      (0 until nParas).foreach { para =>
        val seed = doc * 1009 + page * 101 + para * 11
        val nLines = 2 + seed % 3
        val left = if (para % 3 == 2) 167 else 135
        val size = if (para % 4 == 3) 2 else 0
        (0 until nLines).foreach { line =>
          val fid =
            if (size == 2) 2
            else if (line == 1 && para % 2 == 1) 1 // bold line glues
            else 0
          val base = pick(seed + line, 5 + (seed + line) % 4)
          val text =
            if (line < nLines - 1 && (seed + line) % 7 == 0) base + "-"
            else if ((seed + line) % 5 == 0) base + " "
            else base
          sb.append(s"""<text top="$top" left="$left" width="500" """)
          sb.append(s"""height="20" font="$fid">${text}</text>\n""")
          top += 21
        }
        top += 21 // paragraph gap: 42 > bottom + height/2
      }
      sb.append("</page>\n")
    }
    sb.append("</pdf2xml>\n")
    sb.toString
  }

  /** Raw per-line boxes of every artifact — the oracle's input
    * (per-row parse; glue NOT applied). */
  def rawBoxes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      pdf.pages.flatMap { p =>
        p.boxes.zipWithIndex.map { case (b, i) =>
          val f = pdf.fontspec(b.fontid)
          (d, p.number, i, b.top, b.left, b.width, b.height,
            b.fontid, f.family, f.size, b.text)
        }
      }
    }.toDF("doc", "page", "seq", "top", "left", "width", "height",
      "fontid", "family", "size", "text")
  }

  /** The glued textboxes stream, run through the REAL
    * PdfReader.textboxes() per row. */
  def textboxes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      pdf.pages.flatMap { page =>
        val one = pdf.copy(pages = Vector(page))
        one.textboxes().zipWithIndex.map { case (tb, i) =>
          (d, page.number, i + 1, tb.top, tb.left, tb.bottom, tb.right,
            tb.text)
        }
      }
    }.toDF("doc", "page", "tb_seq", "top", "left", "bottom", "right",
        "text")
      .orderBy("doc", "page", "tb_seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pdf_textboxes" -> textboxes)

  val baseTables: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pdf_boxes" -> ((s, _) => rawBoxes(s)))

  /** The glue stream re-derived relationally: lag()-window boundary on
    * the default-glue predicate (same base family and size, same left,
    * downward, within half a line-height — pdfreader.py:1039-1070 with
    * textbox.bottom == prev.bottom on monotone layouts), cumulative-sum
    * group ids, and the Textbox.__add__ seam fold (space unless the
    * seam already has one or ends in a hyphen/dash; '-' + lowercase
    * dehyphenates). */
  val oracleSql: Map[String, String] = Map(
    "pdf_textboxes" ->
      """WITH b AS (
           SELECT *,
             replace(replace(replace(family,'-',''),'Bold',''),
               'Italic','') AS basefam,
             top + height AS bottom, "left" + width AS "right"
           FROM read_parquet('__BASE__/pdf_boxes/*.parquet')),
         w AS (
           SELECT *,
             CASE WHEN lag(seq) OVER pw IS NULL
                  OR NOT (lag(basefam) OVER pw = basefam
                          AND lag(size) OVER pw = size
                          AND lag("left") OVER pw = "left"
                          AND lag(top) OVER pw < top
                          AND lag(bottom) OVER pw
                              + 0.5 * lag(height) OVER pw >= top)
               THEN 1 ELSE 0 END AS newgrp
           FROM b
           WINDOW pw AS (PARTITION BY doc, page ORDER BY seq)),
         g AS (
           SELECT *, sum(newgrp)
             OVER (PARTITION BY doc, page ORDER BY seq) AS grp
           FROM w),
         e AS (
           SELECT *,
             lead(text) OVER (PARTITION BY doc, page, grp
                              ORDER BY seq) AS nxt
           FROM g),
         f AS (
           SELECT doc, page, grp, seq, top, "left", bottom, "right",
             (CASE WHEN nxt IS NOT NULL AND text LIKE '%-'
                        AND regexp_matches(nxt, '^[a-z]')
                   THEN substr(text, 1, length(text) - 1)
                   ELSE text END) ||
             (CASE WHEN nxt IS NOT NULL
                        AND NOT (text LIKE '% ' OR text LIKE '%-'
                                 OR text LIKE '%–'
                                 OR nxt LIKE ' %')
                   THEN ' ' ELSE '' END) AS emit
           FROM e)
         SELECT doc, page, cast(grp AS int) AS tb_seq,
           min(top) AS top, min("left") AS "left",
           cast(max(bottom) AS int) AS bottom, max("right") AS "right",
           string_agg(emit, '' ORDER BY seq) AS text
         FROM f GROUP BY doc, page, grp""")
}
