package graft.pdf

import scala.collection.mutable
import java.util.regex.Pattern
import graft.parse.PdfReader.{PdfDoc, PdfPage, Textbox}

/** Proposition-specific document analyzer — the reference's PropAnalyzer
  * (/root/reference/ferenda/sources/legal/se/propositioner.py:62-223):
  * segments a prop PDF into frontmatter / main / appendix / eudok parts
  * from per-page style statistics and page-dimension changes, computes
  * metrics over the main segment only, skips the title page when
  * counting styles, and is more conservative about page-number guesses
  * in scanned sources.
  */
class PropAnalyzer(pdf: PdfDoc, scannedSource0: Boolean = false)
    extends PdfAnalyzer(pdf, styleSignificanceThreshold = 0.001,
      scannedSource = scannedSource0) {

  /** boxmatch (propositioner.py:71-77): first group of the first
    * box whose text re.match:es `textpattern`. */
  private def boxmatch(boxes: Vector[Textbox],
                       textpattern: String): Option[String] = {
    val p = Pattern.compile(textpattern)
    boxes.iterator.map(b => p.matcher(b.text)).collectFirst {
      case m if m.lookingAt() => m.group(1)
    }
  }

  /** documents (propositioner.py:70-148). */
  override lazy val documents: Seq[(Int, Int, String)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int, String)]
    // style usage accumulated over main pages; top page dims over main
    val mainstyles = mutable.LinkedHashMap.empty[(String, Int), Long]
    val widthCount = mutable.LinkedHashMap.empty[Int, Long]
    val heightCount = mutable.LinkedHashMap.empty[Int, Long]
    def topOf(c: mutable.LinkedHashMap[Int, Long]): Option[Int] =
      if (c.isEmpty) None else Some(c.toSeq.sortBy(-_._2).head._1)
    var currentappendix: Option[String] = None
    pdf.pages.zipWithIndex.foreach { case (page, pageidx) =>
      val styles = countStyles(pageidx, 1)
      val most = styles.toSeq.sortBy(-_._2).headOption
      var currentdoc = "main"
      if (most.exists(_._1._1.startsWith("EUAlbertina"))) {
        currentdoc = "eudok"
        currentappendix = boxmatch(
          page.boundingbox(bottom = page.height / 5), "Bilaga (\\d)\\s*$")
      } else {
        val appendix = boxmatch(
          page.boundingbox(bottom = page.height / 5), "Bilaga (\\d)\\s*$")
        val top3 = mainstyles.toSeq.sortBy(-_._2).take(3).map(_._1._1)
        if (appendix.isDefined && appendix != currentappendix &&
            most.isDefined && !top3.contains(most.get._1._1)) {
          currentdoc = "appendix"
        } else if (scannedSource) {
          // scanned sources have fluctuating page sizes
          currentdoc = "main"
        } else if (pageidx == 0 && boxmatch(
            // box.top >= 0.8*height with float rhs ⟺ top >= ceil(0.8*h)
            page.boundingbox(top = math.ceil(page.height * 0.8).toInt),
            "(REGERINGENS PROPOSITION)").isDefined) {
          currentdoc = "frontmatter"
        } else {
          val dimChanged = topOf(heightCount).exists(h =>
            math.abs(h - page.height) > 1) ||
            topOf(widthCount).exists(w => math.abs(w - page.width) > 1)
          if (topOf(heightCount).isDefined && dimChanged) {
            currentdoc =
              if (out.lastOption.exists(_._3 == "frontmatter")) "main"
              else "appendix"
          } else {
            currentdoc = "main"
            currentappendix = appendix
          }
        }
      }
      if (currentdoc == "main") {
        styles.foreach { case (k, v) =>
          mainstyles(k) = mainstyles.getOrElse(k, 0L) + v }
        widthCount(page.width) = widthCount.getOrElse(page.width, 0L) + 1
        heightCount(page.height) = heightCount.getOrElse(page.height, 0L) + 1
      }
      if (out.nonEmpty && out.last._3 == currentdoc)
        out(out.length - 1) = (out.last._1, out.last._2 + 1, currentdoc)
      else out += ((pageidx, 1, currentdoc))
    }
    out.toSeq
  }

  /** guess_pagenumber_select (propositioner.py:150-170): scanned
    * sources only accept the smallest candidate in
    * [probable, 2×probable], and never roman numerals (except treating
    * a stray 'l' on the first page as 1). */
  override def guessPagenumberSelect(candidates: Seq[Either[Int, String]],
      probable: Either[Int, String]): Option[Either[Int, String]] = {
    if (scannedSource) {
      candidates.headOption match {
        case Some(Right(_)) if probable == Left(1) => Some(Left(1))
        case _ =>
          val p = probable.left.getOrElse(return None)
          candidates.collect { case Left(i) => i }.sorted
            .find(c => c >= p && c <= p * 2).map(Left(_))
      }
    } else super.guessPagenumberSelect(candidates, probable)
  }

  /** guess_pagenumber_boxes (propositioner.py:172-184): scanned sources
    * only consider thin boxes (page numbers stand by themselves). */
  override def guessPagenumberBoxes(boxes: Vector[Textbox]): Seq[Textbox] =
    if (scannedSource) {
      val pw = pdf.pages.headOption.map(_.width).getOrElse(1)
      (boxes.reverse.take(5) ++ boxes.take(5)).filter(_.width < pw / 50)
    } else super.guessPagenumberBoxes(boxes)

  /** count_styles (propositioner.py:216-222): never count the front
    * page — its title font would be mistaken for h1. */
  override def countStyles(startpage: Int, pagecount: Int)
      : mutable.LinkedHashMap[(String, Int), Long] =
    super.countStyles(if (startpage == 0) 1 else startpage, pagecount)

  /** metrics (propositioner.py:186-214): single segment → plain
    * metrics; multi-segment → per-segment metrics, return the first
    * MAIN segment's (other segments' pages are excluded from the
    * main statistics). */
  override def metrics(startpage: Int = 0, pagecount0: Int = -1)
      : (Map[String, Int], Map[String, (String, Int)], Boolean) = {
    val docsegments = documents
    if (docsegments.length == 1)
      super.metrics(startpage, pagecount0)
    else {
      val results = docsegments.map { case (sp, pc, _) =>
        super.metrics(sp, pc) }
      val mainidx = docsegments.indexWhere(_._3 == "main")
      results(if (mainidx < 0) 0 else mainidx)
    }
  }
}
