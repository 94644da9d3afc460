package graft.pdf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed execution surface for the offtryck STRUCTURE chain: a
  * deterministic corpus of proposition-shaped pdf2xml artifacts is
  * synthesized EXECUTOR-SIDE (pure function of the doc index — the
  * FsCorpus discipline), the FULL [[OfftryckDoc.parse]] pipeline runs
  * per document as a narrow map (PdfReader → PropAnalyzer → pagination
  * → offtryck FSM → postprocess; no shuffle until the ordered output —
  * the 100 TB shape: förarbeten parse embarrassingly parallel), and
  * the structural rows are the query output.
  *
  * The DuckDB oracle replays the PLANTING formulas: every section
  * ordinal, title, minted fragment and nesting depth is a pure
  * function of the doc index, so hash equality proves the FSM
  * recovered the planted structure THROUGH the layout noise the
  * generator adds — margin identifiers, margin page numbers, a dotted
  * Innehållsförteckning (which the parser must consume and DISCARD), a
  * duplicate section ordinal (which must demote to a pseudosection),
  * and an appendix announced only by its margin note. The chain itself
  * is golden-tested against all 17 of the reference's own parsed prop
  * fixtures (OfftryckStructureSpec).
  */
object PropCorpus {

  final val N = 96L

  def year(i: Long): Long = 2000 + i % 15
  def lopnr(i: Long): Long = 10 + i % 80
  /** "2014/15:37" style basefile. */
  def basefile(i: Long): String = {
    val y = year(i)
    f"$y/${(y + 1) % 100}%02d:${lopnr(i)}"
  }
  def nsec(i: Long): Int = 3 + (i % 4).toInt
  def nsub(i: Long, k: Int): Int = ((i + k) % 3).toInt
  def secTitle(i: Long, k: Int): String = s"Rubrik om ämne ${(i + k) % 50}"
  def subTitle(k: Int, m: Int): String = s"Underrubrik om del $m"
  val subsubTitle = "Detaljer om tillämpningen"
  def rubrik(i: Long): String = s"Lag om ämne ${i % 50}"
  def appendixTitle(i: Long): String =
    s"Sammanfattning av underlag ${i % 9}"
  def hasDup(i: Long): Boolean = i % 7 == 0

  /** One proposition-shaped pdf2xml artifact. Fonts: 0 = default 12pt,
    * 1 = h1 20pt, 2 = h2 17pt. Layout per page: content at left 77
    * (right edge 523), margin page number + margin identifier in the
    * right margin (left 650) — both must be classified nonessential
    * and the digits must drive pagination. */
  def artifact(i: Long): String = {
    val id = s"Prop. ${basefile(i)}"
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<pdf2xml producer=\"poppler\" version=\"0.56.0\">\n")
    var pageno = 0
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    def openPage(): Unit = {
      pageno += 1
      sb.append(s"""<page number="$pageno" position="absolute" top="0" """)
      sb.append("left=\"0\" height=\"1029\" width=\"701\">\n")
      sb.append("<fontspec id=\"0\" size=\"12\" family=\"TestRoman\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"1\" size=\"20\" family=\"TestBold\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"2\" size=\"17\" family=\"TestBold\"" +
        " color=\"#000000\"/>\n")
    }
    def box(top: Int, left: Int, width: Int, font: Int,
            text: String): Unit = {
      val h = if (font == 1) 21 else if (font == 2) 18 else 13
      sb.append(s"""<text top="$top" left="$left" width="$width" """)
      sb.append(s"""height="$h" font="$font">${esc(text)}</text>\n""")
    }
    def para(top: Int, text: String): Unit = box(top, 77, 446, 0, text)
    def margins(): Unit = {
      box(400, 650, 40, 0, id)        // margin identifier
      box(960, 650, 14, 0, pageno.toString) // printed page number
    }
    def closePage(): Unit = {
      // body filler: real prop pages are text-dense — without this the
      // per-page margin boxes would out-count the content right edge on
      // the sparse synthetic layout and poison the quantized
      // rightmargin detection (findmargin's 80%-of-max bin rule)
      para(700, s"Den föreslagna ordningen på sidan $pageno innebär " +
        "att de berörda myndigheterna ska samverka vid tillämpningen")
      para(760, "Bestämmelserna kompletterar den allmänna regleringen " +
        "och gäller vid sidan av annan författning på området")
      margins()
      sb.append("</page>\n")
    }

    // page 1: frontmatter
    openPage()
    box(62, 77, 400, 1, s"Regeringens proposition ${basefile(i)}")
    box(110, 77, 380, 2, rubrik(i))
    para(200, s"Regeringen överlämnar denna proposition till riksdagen " +
      s"i ärende ${i % 50} för behandling under året")
    closePage()
    // page 2: preamble
    openPage()
    box(62, 77, 380, 1, "Propositionens huvudsakliga innehåll")
    para(100, s"I propositionen föreslås ändringar som rör ämne ${i % 50} " +
      "och de närmare villkoren för tillämpningen av bestämmelserna")
    para(160, "Lagändringarna föreslås träda i kraft den 1 juli nästa år")
    closePage()
    // page 3: table of contents (discarded by the parser)
    openPage()
    box(62, 77, 250, 1, "Innehållsförteckning")
    var top = 100
    (1 to nsec(i)).foreach { k =>
      para(top, s"$k ${secTitle(i, k)} " + "." * 20 + s" ${3 + k}")
      top += 20
    }
    closePage()
    // section pages: one h1 section per page, subsections below it
    (1 to nsec(i)).foreach { k =>
      openPage()
      box(62, 77, 420, 1, s"$k ${secTitle(i, k)}")
      var y = 110
      para(y, s"Övervägandena i avsnitt $k rör ämne ${(i + k) % 50} och " +
        "behandlar förutsättningarna i den nya regleringen")
      y += 60
      (1 to nsub(i, k)).foreach { m =>
        box(y, 77, 380, 2, s"$k.$m ${subTitle(k, m)}")
        y += 40
        para(y, s"Underavsnittet $k.$m innehåller en närmare redogörelse " +
          "för de frågor som behandlas i det föregående")
        y += 60
        if (k == 2 && m == 1) {
          box(y, 77, 360, 2, s"2.1.1 $subsubTitle")
          y += 40
          para(y, "De närmare detaljerna om tillämpningen framgår av " +
            "den föreslagna paragrafens andra stycke")
          y += 60
        }
      }
      closePage()
    }
    // duplicate-ordinal page (pseudosection demotion)
    if (hasDup(i)) {
      openPage()
      box(62, 77, 420, 1, s"2 ${secTitle(i, 2)}")
      para(110, "Avsnittet upprepar en tidigare avsnittsnumrering och " +
        "ska därför inte ge upphov till någon ny resurs")
      closePage()
    }
    // appendix page: margin note only, then the h2 appendix title
    openPage()
    box(80, 650, 40, 0, "Bilaga 1")
    box(130, 77, 380, 2, appendixTitle(i))
    para(180, "Underlaget sammanfattar de förslag som remissinstanserna " +
      "har yttrat sig över i ärendet och deras huvudsakliga innehåll")
    closePage()
    sb.append("</pdf2xml>\n")
    sb.toString
  }

  // ------------------------------------------------- commentary corpus
  final val CommentaryN = 64L

  def lawYear(i: Long): Long = 1970 + i % 30
  def lawNo(i: Long): Long = 100 + i % 400
  def lawId(i: Long): String = s"${lawYear(i)}:${lawNo(i)}"
  def lawName(i: Long): String = s"testlagen (${lawId(i)})"
  def nKommentar(i: Long): Int = 2 + (i % 3).toInt

  /** A proposition whose Författningskommentar chapter carries planted
    * acttext/comment paragraphs: acttext = tight 3-line boxes
    * (linespacing ≈ 1.08) or a small-font variant, comments = loose
    * 3-line boxes (≈ 1.67) or a "Paragrafen innehåller …" regex
    * variant, one §-header per kommentar (every 4th without quoted
    * acttext — the discard-header path). The classifier must recover
    * exactly one anchored kommentar per §. */
  def commentaryArtifact(i: Long): String = {
    val id = s"Prop. ${basefile(i)}"
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<pdf2xml producer=\"poppler\" version=\"0.56.0\">\n")
    var pageno = 0
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    def openPage(): Unit = {
      pageno += 1
      sb.append(s"""<page number="$pageno" position="absolute" top="0" """)
      sb.append("left=\"0\" height=\"1029\" width=\"701\">\n")
      sb.append("<fontspec id=\"0\" size=\"12\" family=\"TestRoman\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"1\" size=\"20\" family=\"TestBold\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"2\" size=\"17\" family=\"TestBold\"" +
        " color=\"#000000\"/>\n")
      sb.append("<fontspec id=\"3\" size=\"10\" family=\"TestSmall\"" +
        " color=\"#000000\"/>\n")
    }
    def box(top: Int, left: Int, width: Int, font: Int,
            text: String): Unit = {
      val h = if (font == 1) 21 else if (font == 2) 18
              else if (font == 3) 11 else 13
      sb.append(s"""<text top="$top" left="$left" width="$width" """)
      sb.append(s"""height="$h" font="$font">${esc(text)}</text>\n""")
    }
    def para(top: Int, text: String): Unit = box(top, 77, 446, 0, text)
    def closePage(): Unit = {
      para(700, "Den föreslagna ordningen innebär att de berörda " +
        "myndigheterna ska samverka vid tillämpningen av reglerna")
      para(760, "Bestämmelserna kompletterar den allmänna regleringen " +
        "och gäller vid sidan av annan författning på området")
      box(400, 650, 40, 0, id)
      box(960, 650, 14, 0, pageno.toString)
      sb.append("</page>\n")
    }
    // three glued lines at `spacing` points apart; linespacing =
    // ((2*spacing) / 2) / fontsize — 20pt spacing ⇒ loose (1.67),
    // 13pt ⇒ tight (1.08)
    def multiline(top: Int, font: Int, spacing: Int,
                  l1: String, l2: String, l3: String): Unit = {
      box(top, 77, 446, font, l1)
      box(top + spacing, 77, 446, font, l2)
      box(top + 2 * spacing, 77, 446, font, l3)
    }

    openPage() // frontmatter
    box(62, 77, 400, 1, s"Regeringens proposition ${basefile(i)}")
    box(110, 77, 380, 2, s"Ändringar i ${lawName(i)}")
    para(200, "Regeringen överlämnar denna proposition till riksdagen " +
      "för behandling i vanlig ordning under det pågående riksmötet")
    closePage()
    openPage() // preamble — the FSM leaves frontmatter on this heading
    box(62, 77, 380, 1, "Propositionens huvudsakliga innehåll")
    para(110, s"I propositionen föreslås ändringar i ${lawName(i)} " +
      "som rör de närmare villkoren för tillämpningen")
    closePage()
    openPage() // the lagförslag section (find_primary_law target)
    box(62, 77, 420, 1, s"1 Förslag till lag om ändring i ${lawName(i)}")
    para(110, "Härigenom föreskrivs att lagen ska ha följande lydelse " +
      "och att de nya bestämmelserna ska tillämpas första gången i år")
    closePage()
    // the kommentar chapter: h1 + per-law h2, then § blocks
    openPage()
    box(62, 77, 420, 1, "2 Författningskommentar")
    box(110, 77, 400, 2, s"2.1 Förslaget till lag om ändring i " +
      lawName(i))
    var y = 170
    (1 to nKommentar(i)).foreach { j =>
      if (y > 560) { closePage(); openPage(); y = 62 }
      box(y, 77, 30, 0, s"$j §")
      y += 33
      val hasActtext = j % 4 != 3
      if (hasActtext) {
        if (j % 3 == 2)
          // small-font quoted acttext (the size-rule branch)
          multiline(y, 3, 12,
            "Den som uppsåtligen bryter mot bestämmelserna i denna",
            "paragraf ska dömas till ansvar enligt vad som närmare",
            "anges i den föreslagna lydelsen av paragrafen")
        else
          // tight-linespacing quoted acttext
          multiline(y, 0, 13,
            "Den som uppsåtligen bryter mot bestämmelserna i denna",
            "paragraf ska dömas till ansvar enligt vad som närmare",
            "anges i den föreslagna lydelsen av paragrafen")
        y += 2 * (if (j % 3 == 2) 12 else 13) + 13 + 20
      }
      if (j % 3 == 1)
        // regex-recognized comment, loose spacing
        multiline(y, 0, 20,
          s"Paragrafen innehåller bestämmelser om ämne ${(i + j) % 50}",
          "och har utformats i enlighet med vad utredningen föreslog",
          "i sitt betänkande efter remissbehandlingen av förslaget")
      else
        // linespacing-recognized comment
        multiline(y, 0, 20,
          s"Genom ändringen klargörs tillämpningen i ämne ${(i + j) % 50}",
          "så att de nya kraven får genomslag i rättstillämpningen",
          "på det sätt som har förutsatts under beredningen av ärendet")
      y += 2 * 20 + 13 + 40
    }
    closePage()
    sb.append("</pdf2xml>\n")
    sb.toString
  }

  /** The commentary law-citation config: anonymous 'lagen (YYYY:NN)'
    * resolution suffices; base mints example.org/sfs URIs. */
  val commentaryLawConf: graft.parse.LawRef.Conf =
    graft.parse.LawRef.Conf(
      base = s"${graft.kg.EntityDict.base}/sfs/", baseLaw = None)

  /** Driver row: the FULL pipeline incl. the find_commentary visitor
    * pass; rows = structural + kommentar rows; the oracle replays the
    * planted anchors and labels — a classification misfire (acttext
    * taken for comment or vice versa) produces extra/missing/mis-
    * anchored kommentar rows. */
  def offtryckCommentary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, CommentaryN, 1, spark.sparkContext.defaultParallelism)
      .flatMap { i =>
        val bf = basefile(i)
        val src = OfftryckDoc.Source(
          content = commentaryArtifact(i), hocr = false,
          fontinfo = Map.empty, basefile = bf,
          identifier = s"Prop. $bf",
          baseuri = s"https://example.org/prop/$bf",
          srcName = "index.pdf",
          commentary = Some(commentaryLawConf))
        val body = OfftryckDoc.parse(src)
        OfftryckDoc.structure(body).filter(_.kind != "sid").zipWithIndex
          .map { case (r, seq) =>
            (i, seq, r.depth, r.kind, r.frag, r.title) }
      }
      .toDF("doc_id", "seq", "depth", "kind", "frag", "title")
      .orderBy("doc_id", "seq")
  }

  val commentaryOracleSql: String =
    s"""WITH docs AS (
         SELECT i AS doc_id, 2000 + (i % 15) AS y, 10 + (i % 80) AS n,
           1970 + (i % 30) AS ly, 100 + (i % 400) AS ln,
           2 + (i % 3) AS m
         FROM range(0, $CommentaryN) t(i)),
       base AS (
         SELECT doc_id,
           y || '/' || lpad(((y + 1) % 100)::VARCHAR, 2, '0') || ':' || n
             AS bf,
           'testlagen (' || ly || ':' || ln || ')' AS lawname,
           'https://example.org/sfs/' || ly || ':' || ln AS lawuri, m
         FROM docs),
       rows0 AS (
         SELECT doc_id, 0 AS k1, 0 AS k2, 0 AS depth,
           'frontmatter' AS kind, '-' AS frag, '' AS title FROM base
         UNION ALL
         SELECT doc_id, 0, 1, 1, 'prophuvudrubrik', '-',
           'Regeringens proposition ' || bf FROM base
         UNION ALL
         SELECT doc_id, 0, 2, 1, 'proprubrik', '-',
           'Ändringar i ' || lawname FROM base
         UNION ALL
         SELECT doc_id, 1, 0, 0, 'preamblesection', '#PS1',
           'Propositionens huvudsakliga innehåll' FROM base
         UNION ALL
         SELECT doc_id, 2, 0, 0, 'section', '#S1',
           'Förslag till lag om ändring i ' || lawname FROM base
         UNION ALL
         SELECT doc_id, 3, 0, 0, 'section', '#S2',
           'Författningskommentar' FROM base
         UNION ALL
         SELECT doc_id, 3, 1, 1, 'section', '#S2-1',
           'Förslaget till lag om ändring i ' || lawname FROM base
         UNION ALL
         SELECT doc_id, 3, 1 + j, 2, 'kommentar',
           lawuri || '#P' || j,
           'Författningskommentar till ' || j || ' § ' || lawname
         FROM base, range(1, 5) s(j) WHERE j <= m)
       SELECT doc_id,
         cast(row_number() OVER (PARTITION BY doc_id
           ORDER BY k1, k2) - 1 AS int) AS seq,
         depth, kind, frag, title
       FROM rows0 ORDER BY doc_id, seq"""

  /** The structural rows recovered by the REAL pipeline, one prop per
    * input row (pagebreak rows excluded — their placement is pinned by
    * the 17 reference goldens; here the oracle replays structure). */
  def offtryckStructure(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, N, 1, spark.sparkContext.defaultParallelism)
      .flatMap { i =>
        val bf = basefile(i)
        val src = OfftryckDoc.Source(
          content = artifact(i), hocr = false,
          fontinfo = Map.empty, basefile = bf,
          identifier = s"Prop. $bf",
          baseuri = s"https://example.org/prop/$bf",
          srcName = "index.pdf")
        val body = OfftryckDoc.parse(src)
        OfftryckDoc.structure(body).filter(_.kind != "sid").zipWithIndex
          .map { case (r, seq) =>
            (i, seq, r.depth, r.kind, r.frag, r.title) }
      }
      .toDF("doc_id", "seq", "depth", "kind", "frag", "title")
      .orderBy("doc_id", "seq")
  }

  /** The oracle replays the planting formulas in SQL — structure rows
    * per doc in document order, seq assigned by a deterministic sort
    * key: frontmatter block (0), preamble (1), section k at
    * (10+k, m, s), duplicate pseudosection (900), appendix (999). */
  val oracleSql: String =
    s"""WITH docs AS (
         SELECT i AS doc_id,
           2000 + (i % 15) AS y, 10 + (i % 80) AS n,
           3 + (i % 4) AS nsec, (i % 7 = 0) AS hasdup
         FROM range(0, $N) t(i)),
       base AS (
         SELECT doc_id,
           y || '/' || lpad(((y + 1) % 100)::VARCHAR, 2, '0') || ':' || n
             AS bf, nsec, hasdup
         FROM docs),
       rows0 AS (
         SELECT doc_id, 0 AS k1, 0 AS k2, 0 AS k3, 0 AS depth,
           'frontmatter' AS kind, '-' AS frag, '' AS title FROM base
         UNION ALL
         SELECT doc_id, 0, 1, 0, 1, 'prophuvudrubrik', '-',
           'Regeringens proposition ' || bf FROM base
         UNION ALL
         SELECT doc_id, 0, 2, 0, 1, 'proprubrik', '-',
           'Lag om ämne ' || (doc_id % 50) FROM base
         UNION ALL
         SELECT doc_id, 1, 0, 0, 0, 'preamblesection', '#PS1',
           'Propositionens huvudsakliga innehåll' FROM base
         UNION ALL
         SELECT doc_id, 10 + k, 0, 0, 0, 'section', '#S' || k,
           'Rubrik om ämne ' || ((doc_id + k) % 50)
         FROM base, range(1, 8) s(k) WHERE k <= nsec
         UNION ALL
         SELECT doc_id, 10 + k, m, 0, 1, 'section',
           '#S' || k || '-' || m, 'Underrubrik om del ' || m
         FROM base, range(1, 8) s(k), range(1, 3) u(m)
         WHERE k <= nsec AND m <= (doc_id + k) % 3
         UNION ALL
         SELECT doc_id, 12, 1, 1, 2, 'section', '#S2-1-1',
           'Detaljer om tillämpningen'
         FROM base WHERE (doc_id + 2) % 3 >= 1
         UNION ALL
         SELECT doc_id, 900, 0, 0, 0, 'pseudosection', '-',
           '2 Rubrik om ämne ' || ((doc_id + 2) % 50)
         FROM base WHERE hasdup
         UNION ALL
         SELECT doc_id, 999, 0, 0, 0, 'appendix', '#B1',
           'Sammanfattning av underlag ' || (doc_id % 9) FROM base)
       SELECT doc_id,
         cast(row_number() OVER (PARTITION BY doc_id
           ORDER BY k1, k2, k3) - 1 AS int) AS seq,
         depth, kind, frag, title
       FROM rows0 ORDER BY doc_id, seq"""
}
