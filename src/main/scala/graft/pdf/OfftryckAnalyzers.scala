package graft.pdf

import scala.collection.mutable
import java.util.regex.Pattern
import graft.parse.PdfReader.{PdfDoc, Textbox}

/** The remaining doctype-specific PDF analyzers of the offtryck
  * family — SOUAnalyzer (/root/reference/ferenda/sources/legal/se/
  * sou.py:33-120), DsAnalyzer (ds.py:27-85) and DirAnalyzer
  * (direktiv.py:60-95): title-driven frontmatter/main/endregister
  * segmentation, doctype thresholds, and the kommittédirektiv style
  * layout (title/h1/h2 picked by rank, not size-above-default).
  *
  * `glue`: parse_body assigns the offtryck gluefunc onto the analyzer
  * before `documents` is read (offtryck.py:421-424's "temporary
  * non-API workaround") — the titleish probe iterates GLUED boxes. */
class SouAnalyzer(pdf: PdfDoc, scannedSource0: Boolean = false,
                  glue: Option[(Textbox, Textbox, Textbox) => Boolean] = None,
                  style0: Double = 0.0007, header0: Double = 0.03,
                  footer0: Double = 0.01)
    extends PdfAnalyzer(pdf,
      styleSignificanceThreshold = style0,
      headerSignificanceThreshold = header0,
      footerSignificanceThreshold = footer0,
      scannedSource = scannedSource0) {

  /** titleish (sou.py:33-41): largest upper-case-starting box. */
  protected def titleish(pageidx: Int): Option[Textbox] = {
    val boxes = glue match {
      case Some(g) =>
        pdf.copy(pages = Vector(pdf.pages(pageidx))).textboxes(g)
      case None => pdf.pages(pageidx).boxes
    }
    var candidate: Option[Textbox] = None
    boxes.foreach { te =>
      if (candidate.isEmpty ||
          (te.text.nonEmpty && te.text.charAt(0).isUpper &&
            pdf.fontspec(te.fontid).size >
              pdf.fontspec(candidate.get.fontid).size))
        candidate = Some(te)
    }
    candidate
  }

  /** guess_pagenumber (sou.py:43-57): KB scans paginate predictably —
    * physical page 4 is logical 1; no other numbers are OCR-readable. */
  private var paginateCoverAccounted = false
  override def guessPagenumber(pageNumber: Int, boxes: Vector[Textbox],
      probable: Either[Int, String]): Option[Either[Int, String]] =
    if (scannedSource) {
      if (probable == Left(4) && !paginateCoverAccounted) {
        paginateCoverAccounted = true
        Some(Left(1))
      } else None
    } else super.guessPagenumber(pageNumber, boxes, probable)

  /** documents (sou.py:62-120), minus the multi-volume del-2 logic
    * (single-file fixtures). */
  override lazy val documents: Seq[(Int, Int, String)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var currentdoc = "frontmatter"
    pdf.pages.zipWithIndex.foreach { case (_, pageidx) =>
      if (pageidx > 8 && currentdoc == "frontmatter") {
        // missed the transition — all pages are main
        currentdoc = "main"
        if (out.nonEmpty) out(0) = (out(0)._1, out(0)._2, "main")
      }
      titleish(pageidx).map(t =>
        graft.parse.OfftryckParser.pyStrip(t.text)).foreach { pgtitle =>
        if (Pattern.compile("(Till [sS]|S)tatsrådet ").matcher(pgtitle)
            .lookingAt()) currentdoc = "main"
        else if (Set("Innehåll", "Innehållsförteckning", "Innehåll del 2")
            .contains(pgtitle)) currentdoc = "main"
        else if (Pattern.compile("Statens offentliga utredningar \\d+")
            .matcher(pgtitle).lookingAt()) currentdoc = "endregister"
      }
      val styles = countStyles(pageidx, 1)
      if (styles.toSeq.sortBy(-_._2).take(2)
          .exists(_._1._1.startsWith("EUAlbertina")))
        currentdoc = "eudok"
      // NB: the reference's `elif currentdoc == "eudok": currentdoc ==
      // "main"` is a no-op comparison (its own ## CONTINUE marker) —
      // ported faithfully by doing nothing
      if (out.nonEmpty && out.last._3 == currentdoc)
        out(out.length - 1) = (out.last._1, out.last._2 + 1, currentdoc)
      else out += ((pageidx, 1, currentdoc))
    }
    out.toSeq
  }
}

/** DsAnalyzer (ds.py:27-85): like SOU but with ministerial-letter and
  * Departementsserien endregister probes and the default thresholds. */
class DsAnalyzer(pdf: PdfDoc, scannedSource0: Boolean = false,
                 glue: Option[(Textbox, Textbox, Textbox) => Boolean] = None)
    // Ds keeps the base thresholds except style significance
    extends SouAnalyzer(pdf, scannedSource0, glue,
      style0 = 0.001, header0 = 0.002, footer0 = 0.002) {

  override lazy val documents: Seq[(Int, Int, String)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int, String)]
    var currentdoc = "frontmatter"
    pdf.pages.zipWithIndex.foreach { case (_, pageidx) =>
      if (pageidx > 5 && currentdoc == "frontmatter") {
        currentdoc = "main"
        if (out.nonEmpty) out(0) = (out(0)._1, out(0)._2, "main")
      }
      val pgtitle = titleish(pageidx).map(t =>
        graft.parse.OfftryckParser.pyStrip(t.text)).getOrElse("")
      if (currentdoc == "frontmatter" && pgtitle.nonEmpty) {
        val cap = pgtitle.toLowerCase.capitalize
        if (Set("Innehåll", "Innehållsförteckning", "Innehåll del 2")
            .contains(cap)) currentdoc = "main"
        else if (Pattern.compile("Till \\w+minister ",
            Pattern.UNICODE_CHARACTER_CLASS).matcher(pgtitle).lookingAt())
          currentdoc = "main"
      }
      if (Pattern.compile("Departementsserien \\d+").matcher(pgtitle)
          .lookingAt()) currentdoc = "endregister"
      val styles = countStyles(pageidx, 1)
      if (styles.toSeq.sortBy(-_._2).take(2)
          .exists(_._1._1.startsWith("EUAlbertina")))
        currentdoc = "eudok"
      if (out.nonEmpty && out.last._3 == currentdoc)
        out(out.length - 1) = (out.last._1, out.last._2 + 1, currentdoc)
      else out += ((pageidx, 1, currentdoc))
    }
    out.toSeq
  }
}

/** DirAnalyzer (direktiv.py:60-95): no footers; a fixed style layout —
  * largest = the "Kommittédirektiv" masthead, 2nd = title, 3rd = the
  * "Dir. YYYY:NN" id, 4th/5th = h1/h2 (body-sized bold/italic). */
class DirAnalyzer(pdf: PdfDoc, scannedSource0: Boolean = false)
    extends PdfAnalyzer(pdf, footerSignificanceThreshold = 0.0,
      scannedSource = scannedSource0) {

  override def analyzeStyles(
      styles: mutable.LinkedHashMap[(String, Int), Long])
      : Map[String, (String, Int)] = {
    if (styles.isEmpty) return Map.empty
    val out = mutable.LinkedHashMap.empty[String, (String, Int)]
    val ds = styles.toSeq.sortBy(-_._2).head._1
    out("default") = ds
    val ranked = styles.keys.toSeq
      .sortBy(fontsizeKey)(implicitly[Ordering[(Int, Int)]].reverse)
      .slice(1, 5)
    ranked.length match {
      case n if n < 3 => // dir 1991:49: only a title style
        ranked.headOption.foreach(out("title") = _)
      case 3 =>
        out("title") = ranked(0)
        out("h1") = ranked(2)
      case _ =>
        out("title") = ranked(0)
        out("h1") = ranked(2)
        if (ranked(3) != ds) out("h2") = ranked(3)
    }
    out.toMap
  }
}
