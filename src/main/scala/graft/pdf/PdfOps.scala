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
    * (per-row parse; glue NOT applied). Page dimensions ride along for
    * the analyzer oracle. */
  def rawBoxes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      pdf.pages.flatMap { p =>
        p.boxes.zipWithIndex.map { case (b, i) =>
          val f = pdf.fontspec(b.fontid)
          (d, p.number, i, b.top, b.left, b.width, b.height,
            b.fontid, f.family, f.size, b.text, p.width, p.height)
        }
      }
    }.toDF("doc", "page", "seq", "top", "left", "width", "height",
      "fontid", "family", "size", "text", "page_width", "page_height")
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

  /** Offtryck-glue boundary flags per raw box: the REAL
    * [[graft.parse.OfftryckGlue]] predicate run under the same
    * streaming fold textboxes() applies (whitespace-only boxes dropped
    * exactly as textboxes() drops them). The predicate itself is
    * golden-tested against the reference's own integrationOfftryck
    * fixtures (OfftryckGlueSpec); this dump lets the oracle replay the
    * RELATIONAL layer — grouping, geometry, seam folding — without
    * restating the 130-rule geometry predicate in SQL (the simhash/
    * fingerprint base-dump pattern). */
  def offtryckFlags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      val glue = graft.parse.OfftryckGlue.gluefunc(pdf.fontspec,
        scannedSource = false)
      pdf.pages.flatMap { page =>
        var textbox: Option[PdfReader.Textbox] = None
        var prevbox: Option[PdfReader.Textbox] = None
        page.boxes.zipWithIndex.flatMap { case (b, i) =>
          if (b.text.trim.isEmpty) None
          else {
            val glued = textbox.exists(tb =>
              glue(tb, b, prevbox.getOrElse(tb)))
            textbox = if (glued) textbox.map(_ + b) else Some(b)
            prevbox = Some(b)
            Some((d, page.number, i, glued))
          }
        }
      }
    }.toDF("doc", "page", "seq", "glued")
  }

  /** Official-print paragraph segmentation — the proposition/SOU
    * textbox-merging semantics (offtryck.py get_gluefunc) as a
    * distributed operator: the real gluefunc through the real
    * PdfReader.textboxes() stream, one document per row (narrow map,
    * no shuffle until the output order — the [[textboxes]] execution
    * shape; at 100 TB the per-doc fold stays embarrassingly
    * parallel). */
  def offtryckParagraphs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      val glue = graft.parse.OfftryckGlue.gluefunc(pdf.fontspec,
        scannedSource = false)
      pdf.pages.flatMap { page =>
        val one = pdf.copy(pages = Vector(page))
        one.textboxes(glue).zipWithIndex.map { case (tb, i) =>
          (d, page.number, i + 1, tb.top, tb.left, tb.bottom, tb.right,
            tb.text)
        }
      }
    }.toDF("doc", "page", "para_seq", "top", "left", "bottom", "right",
        "text")
      .orderBy("doc", "page", "para_seq")
  }

  /** Per-document [[PdfAnalyzer]] metrics — the REAL analyzer run as a
    * narrow distributed map (one artifact parsed + analyzed per row, no
    * shuffle), re-derived relationally by the oracle below from the
    * raw box dump: insertion-ordered weighted modes, the quantized
    * right-edge binning with its 80%-of-max candidate rule, cumulative
    * character-mass header/footer scans, and (size, weight)-ranked
    * style roles. */
  def analyzeMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(NDocs).as[Long].map { d =>
      val pdf = PdfReader.parseXml(artifact(d.toInt))
      val (ints, styles, _) = new PdfAnalyzer(pdf).metrics()
      def s(role: String) = styles.get(role)
      (d, ints.get("leftmargin"), ints.get("rightmargin"),
        ints.get("leftmargin_even"), ints.get("rightmargin_even"),
        ints("topmargin"), ints("bottommargin"),
        ints("pagewidth"), ints("pageheight"),
        s("default").map(_._1), s("default").map(_._2),
        s("h1").map(_._1), s("h1").map(_._2),
        s("h2").map(_._1), s("h2").map(_._2),
        s("h3").map(_._1), s("h3").map(_._2))
    }.toDF("doc", "leftmargin", "rightmargin", "leftmargin_even",
      "rightmargin_even", "topmargin", "bottommargin", "pagewidth",
      "pageheight", "default_family", "default_size", "h1_family",
      "h1_size", "h2_family", "h2_size", "h3_family", "h3_size")
      .orderBy("doc")
  }

  // ------------------------------------------------------ hOCR corpus
  /** One synthetic hOCR word in pixel space. `raw` is text + tail as
    * itertext()+tail would see it. */
  final case class HWord(line: Int, word: Int, parid: String,
    lineL: Int, lineT: Int, lineR: Int, lineB: Int,
    l: Int, t: Int, r: Int, b: Int, conf: Int,
    text: String, tail: String, tag: Option[String])

  final val HDocs = 32

  /** Page pixel height per (doc, page) — drives a varying
    * pixel→point scale factor. ODD heights by construction: v/ppp =
    * v·84168/(100·H) can only be an exact half if 100·(2k+1)·H carries
    * 2⁴ (the factor of 84168·2), impossible for odd H — so no integer
    * coordinate lands on the round-half-even/round-half-up divergence
    * point (hocrArtifact's checked() still verifies each value). */
  def hocrPageHeight(doc: Int, page: Int): Int =
    2401 + ((doc + page) % 5) * 62

  /** Deterministic word layout for one hOCR page. Exercises: skipped
    * whitespace-only words, em/strong child tags, a small digit
    * footnote marker (sup) on some lines, a NORMAL-height digit first
    * word (no sup) on others, and length-weighted confidences. */
  def hocrWords(doc: Int, page: Int): Vector[HWord] = {
    val words = Vector.newBuilder[HWord]
    val nLines = 3 + (doc + page) % 4
    (0 until nLines).foreach { line =>
      val seed = doc * 911 + page * 97 + line * 13
      val parid = s"par_${page}_${1 + line / 2}"
      val lineT = 180 + line * 95 + seed % 7
      val lineB = lineT + 78
      val nWords = 3 + seed % 5
      var x = 120 + seed % 11
      val lineL = x
      var lineR = x
      (0 until nWords).foreach { w =>
        val footnote = w == 0 && line % 3 == 1
        val plainDigit = w == 0 && line % 3 == 2
        val h = if (footnote) 24 else 72
        val t = if (footnote) lineT + 30 else lineT + (seed + w) % 5
        val text0 =
          if (footnote) ((seed + w) % 90 + 1).toString
          else if (plainDigit) ((seed + w) % 900 + 10).toString
          else if ((seed + w) % 9 == 4) " " // whitespace-only: skipped
          else Words((seed + w * 7) % Words.length)
        val tag =
          if (!footnote && !plainDigit && text0.trim.nonEmpty) {
            if ((seed + w) % 7 == 3) Some("em")
            else if ((seed + w) % 11 == 7) Some("strong")
            else None
          } else None
        val wWidth = math.max(14, text0.trim.length * 16)
        val tail = if (w == nWords - 1) "\n     " else " "
        words += HWord(line, w, parid, lineL, lineT, lineR max (x + wWidth),
          lineT, x, t, x + wWidth, t + h, 40 + (seed + w * 3) % 56,
          text0, tail, tag)
        x += wWidth + 18
        lineR = x
      }
    }
    // fix line bboxes to the word extents (hOCR lines wrap their words)
    val byLine = words.result().groupBy(_.line)
    byLine.toVector.sortBy(_._1).flatMap { case (_, ws) =>
      val ll = ws.map(_.l).min; val lt = ws.map(_.t).min
      val lr = ws.map(_.r).max; val lb = ws.map(_.b).max
      ws.map(w => w.copy(lineL = ll, lineT = lt, lineR = lr, lineB = lb))
    }
  }

  /** Render one doc's hOCR XHTML (tesseract shape: ocr_page →
    * ocr_carea → ocr_par → ocr_line → ocrx_word). The generator
    * asserts no scaled coordinate lands on an exact .5 — Python-round
    * (half-even, what parseHocr mirrors via rint) and the oracle's
    * plain round() then agree everywhere. */
  def hocrArtifact(doc: Int): String = {
    val php = 11.69 / (1.0 / 72)
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n<body>\n")
    (1 to 2).foreach { page =>
      val ph = hocrPageHeight(doc, page)
      val ppp = ph / php
      def checked(v: Int): Int = {
        val frac = v / ppp - math.floor(v / ppp)
        require(math.abs(frac - 0.5) > 1e-6,
          s"coordinate $v scales to an exact half at ppp=$ppp")
        v
      }
      sb.append(s"<div class='ocr_page' id='page_$page' " +
        s"title='image \"doc$doc.tif\"; bbox 0 0 1784 ${checked(ph)}; " +
        s"ppageno ${page - 1}'>\n")
      sb.append("<div class='ocr_carea' title='bbox 0 0 10 10'>\n")
      val byPar = hocrWords(doc, page).groupBy(_.parid)
      byPar.toVector.sortBy(_._2.head.line).foreach { case (parid, ws) =>
        sb.append(s"<p class='ocr_par' id='$parid'>\n")
        ws.groupBy(_.line).toVector.sortBy(_._1).foreach { case (line, lw) =>
          val h = lw.head
          sb.append(s"<span class='ocr_line' id='line_${page}_$line' " +
            s"title='bbox ${checked(h.lineL)} ${checked(h.lineT)} " +
            s"${checked(h.lineR)} ${checked(h.lineB)}; baseline 0 0'>")
          lw.sortBy(_.word).foreach { w =>
            val inner = w.tag match {
              case Some(tg) => s"<$tg>${w.text}</$tg>"
              case None => w.text
            }
            sb.append(s"<span class='ocrx_word' id='w${page}_${w.line}_" +
              s"${w.word}' title='bbox ${checked(w.l)} ${checked(w.t)} " +
              s"${checked(w.r)} ${checked(w.b)}; x_wconf ${w.conf}'>" +
              s"$inner</span>${w.tail}")
          }
          sb.append("</span>\n")
        }
        sb.append("</p>\n")
      }
      sb.append("</div>\n</div>\n")
    }
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  /** Raw pixel-space hOCR words — the oracle's input (never touches
    * parseHocr). */
  def rawHocrWords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(HDocs).as[Long].flatMap { d =>
      (1 to 2).flatMap { page =>
        hocrWords(d.toInt, page).map { w =>
          (d, page, w.line, w.word, w.parid, w.lineL, w.lineT, w.lineR,
            w.lineB, w.l, w.t, w.r, w.b, w.conf, w.text + w.tail,
            hocrPageHeight(d.toInt, page))
        }
      }
    }.toDF("doc", "page", "line", "word", "parid", "line_l", "line_t",
      "line_r", "line_b", "px_l", "px_t", "px_r", "px_b", "conf", "raw",
      "page_px_h")
  }

  /** The hOCR corpus through the REAL parseHocr, one doc per row (no
    * shuffle until the final order): per-line point-space boxes with
    * confidence, par ids, synthesized font size, and the sup flag. */
  def hocrLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(HDocs).as[Long].flatMap { d =>
      val pdf = PdfReader.parseHocr(hocrArtifact(d.toInt))
      pdf.pages.flatMap { p =>
        p.boxes.zipWithIndex.map { case (b, i) =>
          (d, p.number, i + 1, b.top, b.left, b.width, b.height,
            pdf.fontspec(b.fontid).size, b.parid.get, b.confidence.get,
            b.els.head.tag.contains("sup"), b.text)
        }
      }
    }.toDF("doc", "page", "line_seq", "top", "left", "width", "height",
      "fontsize", "parid", "confidence", "sup", "text")
      .orderBy("doc", "page", "line_seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pdf_textboxes" -> textboxes,
    "pdf_analyze_metrics" -> analyzeMetrics,
    "pdf_offtryck_paragraphs" -> offtryckParagraphs,
    "pdf_offtryck_structure" -> PropCorpus.offtryckStructure,
    "pdf_offtryck_commentary" -> PropCorpus.offtryckCommentary,
    "pdf_hocr_lines" -> hocrLines)

  val baseTables: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pdf_boxes" -> ((s, _) => rawBoxes(s)),
    "pdf_glue_flags" -> ((s, _) => offtryckFlags(s)),
    "pdf_hocr_words" -> ((s, _) => rawHocrWords(s)))

  /** The glue stream re-derived relationally: lag()-window boundary on
    * the default-glue predicate (same base family and size, same left,
    * downward, within half a line-height — pdfreader.py:1039-1070 with
    * textbox.bottom == prev.bottom on monotone layouts), cumulative-sum
    * group ids, and the Textbox.__add__ seam fold (space unless the
    * seam already has one or ends in a hyphen/dash; '-' + lowercase
    * dehyphenates). */
  val oracleSql: Map[String, String] = Map(
    "pdf_offtryck_structure" -> PropCorpus.oracleSql,
    "pdf_offtryck_commentary" -> PropCorpus.commentaryOracleSql,
    // The analyzer re-derived relationally (pdfanalyze.py semantics):
    // insertion-order tie-breaks become min(global box order);
    // most_common ranking = (count DESC, first-seen ASC); the
    // quantized right-margin rule = outermost 10pt bin within 80% of
    // the strongest bin (falling back to the strongest bin when every
    // bin qualifies); header/footer = cumulative character-mass scans;
    // style roles ranked by (size, Bold>Italic weight).
    "pdf_analyze_metrics" ->
      """WITH b AS (
           SELECT doc, page, seq, top, "left", "left"+width AS "right",
             top+height AS bottom, family, size,
             length(trim(text)) AS tlen, page*100000+seq AS ord,
             page_width, page_height
           FROM read_parquet('__BASE__/pdf_boxes/*.parquet')),
         pages AS (
           SELECT DISTINCT doc, page, page_width, page_height FROM b),
         pwm AS (
           SELECT doc, page_width, count(*) c, min(page) fp
           FROM pages GROUP BY doc, page_width),
         pwmode AS (
           SELECT doc, page_width AS pw_mode FROM (
             SELECT doc, page_width, row_number() OVER
               (PARTITION BY doc ORDER BY c DESC, fp ASC) rn FROM pwm)
           WHERE rn = 1),
         pwmax AS (
           SELECT doc, max(page_width) pagewidth,
             max(page_height) pageheight FROM pages GROUP BY doc),
         lm AS (
           SELECT b.doc, b."left", count(*) c, min(ord) fs
           FROM b JOIN pwmode USING (doc)
           WHERE page % 2 = 1 AND b."left" < pw_mode/2.0
           GROUP BY b.doc, b."left"),
         lsel AS (
           SELECT doc, "left" AS leftmargin FROM (
             SELECT doc, "left", row_number() OVER
               (PARTITION BY doc ORDER BY c DESC, fs ASC) rn FROM lm)
           WHERE rn = 1),
         lme AS (
           SELECT b.doc, b."left", count(*) c, min(ord) fs
           FROM b JOIN pwmode USING (doc)
           WHERE page % 2 = 0 AND b."left" < pw_mode/2.0
           GROUP BY b.doc, b."left"),
         lesel AS (
           SELECT doc, "left" AS leftmargin_even FROM (
             SELECT doc, "left", row_number() OVER
               (PARTITION BY doc ORDER BY c DESC, fs ASC) rn FROM lme)
           WHERE rn = 1),
         rm AS (
           SELECT b.doc, b."right" r, count(*) c, min(ord) fs,
             (page % 2 = 1) AS odd
           FROM b JOIN pwmode USING (doc)
           WHERE b."right" > pw_mode/2.0
           GROUP BY b.doc, r, odd),
         rb AS (
           SELECT doc, odd, CAST(ceil(r/10.0)*10 AS INT) bin,
             sum(c) c, min(fs) fs
           FROM rm GROUP BY doc, odd, bin),
         rbx AS (
           SELECT doc, odd, bin, c, fs,
             max(c) OVER (PARTITION BY doc, odd) mx,
             min(c) OVER (PARTITION BY doc, odd) mn,
             row_number() OVER (PARTITION BY doc, odd
               ORDER BY c DESC, fs ASC) rn
           FROM rb),
         rsel AS (
           SELECT doc, odd,
             CASE WHEN max(CASE WHEN mn >= 0.8*mx THEN 1 ELSE 0 END) = 1
                  THEN max(CASE WHEN rn = 1 THEN bin END)
                  ELSE max(CASE WHEN c >= 0.8*mx THEN bin END)
             END AS rightmargin
           FROM rbx GROUP BY doc, odd),
         tm AS (SELECT doc, top, sum(tlen) mass FROM b GROUP BY doc, top),
         tmc AS (
           SELECT doc, top,
             sum(mass) OVER (PARTITION BY doc ORDER BY top) cum,
             sum(mass) OVER (PARTITION BY doc) tot
           FROM tm),
         tsel AS (
           SELECT doc, min(top)-1 AS topmargin FROM tmc
           WHERE cum > 0.002*tot GROUP BY doc),
         bm AS (
           SELECT doc, bottom, sum(tlen) mass FROM b GROUP BY doc, bottom),
         bmc AS (
           SELECT bm.doc, bottom,
             sum(mass) OVER (PARTITION BY bm.doc ORDER BY bottom DESC) cum,
             t.tot
           FROM bm JOIN (SELECT doc, sum(tlen) tot FROM b GROUP BY doc) t
             USING (doc)),
         bsel AS (
           SELECT doc, max(bottom)+1 AS bottommargin FROM bmc
           WHERE cum > 0.002*tot GROUP BY doc),
         st AS (
           SELECT doc, family, size, sum(tlen) c, min(ord) fs
           FROM b GROUP BY doc, family, size),
         stk AS (
           SELECT *, size*10 + (CASE WHEN family LIKE '%Bold%' THEN 2
             WHEN family LIKE '%Italic%' THEN 1 ELSE 0 END) AS k,
             sum(c) OVER (PARTITION BY doc) tot
           FROM st),
         def AS (
           SELECT doc, family AS default_family, size AS default_size,
             k AS dk
           FROM (SELECT *, row_number() OVER
               (PARTITION BY doc ORDER BY c DESC, fs ASC) rn FROM stk)
           WHERE rn = 1),
         lg AS (
           SELECT s.doc, s.family, s.size, row_number() OVER
             (PARTITION BY s.doc ORDER BY s.k DESC, s.fs ASC) rn
           FROM stk s JOIN def d ON s.doc = d.doc
           WHERE s.k > d.dk AND s.c > 0.005*s.tot)
         SELECT p.doc, lsel.leftmargin,
           ro.rightmargin AS rightmargin,
           lesel.leftmargin_even,
           re.rightmargin AS rightmargin_even,
           tsel.topmargin, bsel.bottommargin, p.pagewidth, p.pageheight,
           def.default_family, def.default_size,
           h1.family AS h1_family, h1.size AS h1_size,
           h2.family AS h2_family, h2.size AS h2_size,
           h3.family AS h3_family, h3.size AS h3_size
         FROM pwmax p
         LEFT JOIN lsel USING (doc)
         LEFT JOIN (SELECT doc, rightmargin FROM rsel WHERE odd) ro
           USING (doc)
         LEFT JOIN lesel USING (doc)
         LEFT JOIN (SELECT doc, rightmargin FROM rsel WHERE NOT odd) re
           USING (doc)
         LEFT JOIN tsel USING (doc)
         LEFT JOIN bsel USING (doc)
         LEFT JOIN def USING (doc)
         LEFT JOIN (SELECT doc, family, size FROM lg WHERE rn = 1) h1
           USING (doc)
         LEFT JOIN (SELECT doc, family, size FROM lg WHERE rn = 2) h2
           USING (doc)
         LEFT JOIN (SELECT doc, family, size FROM lg WHERE rn = 3) h3
           USING (doc)""",
    // The hOCR parse re-derived: per-page A4 pixel→point scaling
    // (pdfreader.py:405-424; the generator certifies no coordinate
    // scales to an exact .5, so plain round == Python's half-even),
    // whitespace-word filtering, char-length-weighted confidence,
    // integer-mean font size, and the small-leading-digit sup rule.
    "pdf_hocr_lines" ->
      """WITH w AS (
           SELECT *, page_px_h /
             (11.69::DOUBLE / ((1.0::DOUBLE)/(72.0::DOUBLE))) AS ppp
           FROM read_parquet('__BASE__/pdf_hocr_words/*.parquet')),
         s AS (
           SELECT doc, page, line, word, parid,
             CAST(round(line_l/ppp) AS INT) AS bl,
             CAST(round(line_t/ppp) AS INT) AS bt,
             CAST(round(line_r/ppp) AS INT) AS br,
             CAST(round(line_b/ppp) AS INT) AS bb,
             CAST(round(px_t/ppp) AS INT) AS wt,
             CAST(round(px_b/ppp) AS INT) AS wb,
             conf, replace(raw, chr(10), ' ') AS t
           -- NB: bare trim() strips only spaces in DuckDB; Python's
           -- strip() (what the parser mirrors) also strips \n\t\r
           FROM w WHERE trim(raw, ' ' || chr(10) || chr(9) || chr(13))
             <> ''),
         l AS (
           SELECT doc, page, line, parid,
             min(bl) bl, min(bt) bt, min(br) br, min(bb) bb,
             sum(conf * length(trim(t)))::DOUBLE /
               sum(length(trim(t))) AS confidence,
             CAST(sum(wb - wt) // count(*) AS INT) AS fontsize,
             string_agg(t, '' ORDER BY word) AS text,
             arg_min(trim(t), word) AS ftext,
             arg_min(wb - wt, word) AS fh
           FROM s GROUP BY doc, page, line, parid)
         SELECT doc, page,
           CAST(row_number() OVER (PARTITION BY doc, page ORDER BY line)
             AS INT) AS line_seq,
           bt AS top, bl AS "left", br-bl AS width, bb-bt AS height,
           fontsize, parid, confidence,
           (regexp_matches(ftext, '^[0-9]+$')
             AND fh <= fontsize/2.0) AS sup,
           text
         FROM l""",
    // grouping via the dumped offtryck glue flags (the predicate is
    // golden-tested; the relational layer — cumulative grouping,
    // bbox union, the Textbox.__add__ seam fold — is re-derived here)
    "pdf_offtryck_paragraphs" ->
      """WITH raw AS (
           SELECT doc, page, seq, top, "left",
             top + height AS bottom, "left" + width AS "right", text
           FROM read_parquet('__BASE__/pdf_boxes/*.parquet')
           WHERE trim(text) <> ''),
         fl AS (
           SELECT doc, page, seq, glued
           FROM read_parquet('__BASE__/pdf_glue_flags/*.parquet')),
         w AS (
           SELECT raw.*, CASE WHEN fl.glued THEN 0 ELSE 1 END AS newgrp
           FROM raw JOIN fl USING (doc, page, seq)),
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
         SELECT doc, page, cast(grp AS int) AS para_seq,
           min(top) AS top, min("left") AS "left",
           cast(max(bottom) AS int) AS bottom, max("right") AS "right",
           string_agg(emit, '' ORDER BY seq) AS text
         FROM f GROUP BY doc, page, grp""",
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
