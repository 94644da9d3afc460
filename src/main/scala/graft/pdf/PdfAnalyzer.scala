package graft.pdf

import scala.collection.mutable
import graft.parse.PdfReader.{PdfDoc, Textbox}
import graft.functions.Selectors

/** PDFAnalyzer (/root/reference/ferenda/pdfanalyze.py) — spatial and
  * typographic document metrics over a parsed [[PdfDoc]]: margin
  * detection from positional frequency counters, header/footer zones
  * from cumulative character-mass thresholds, and style roles
  * (default / h1-h3 / footnoteref) from character-weighted font usage.
  *
  * Python's Counter is insertion-ordered and `most_common` breaks count
  * ties by insertion order (stable sort); every counter here is a
  * LinkedHashMap and every ranking a stable sort so tie-breaks match
  * the reference exactly. The debugging surfaces (plot, drawboxes —
  * matplotlib/reportlab renderings the reference's own tests only
  * mock, pdfanalyze.py:551-773) are out of scope.
  *
  * The companion's [[PdfAnalyzer.paginate]] support (guess_pagenumber,
  * pdfanalyze.py:114-235) identifies printed page numbers from the
  * first/last boxes of each page, handling roman-numeral front matter.
  */
class PdfAnalyzer(val pdf: PdfDoc,
                        val twopage: Boolean = true,
                        val styleSignificanceThreshold: Double = 0.005,
                        var headerSignificanceThreshold: Double = 0.002,
                        val footerSignificanceThreshold: Double = 0.002,
                        /** var: offtryck's paginate raises it above the
                          * footnoteref size (offtryck.py:571-576). */
                        var paginationMinSize: Int = 6,
                        val scannedSource: Boolean = false) {

  type Counter = mutable.LinkedHashMap[Int, Long]
  private def newCounter: Counter = mutable.LinkedHashMap.empty[Int, Long]
  private def inc(c: Counter, k: Int, by: Long = 1L): Unit =
    c(k) = c.getOrElse(k, 0L) + by

  /** Counter.most_common: count desc, insertion order on ties
    * (stable sort over the insertion-ordered entries). */
  private def mostCommon(c: Counter): Seq[(Int, Long)] =
    c.toSeq.sortBy(-_._2)

  /** documents (pdfanalyze.py:98-111): the default single-segment
    * answer; subclasses segment differently. */
  def documents: Seq[(Int, Int, String)] = Seq((0, pdf.pages.length, "main"))

  /** The (pagenumber, textbox) stream (pdfanalyze.py:325-332). */
  def textboxes(startpage: Int, pagecount: Int): Seq[(Int, Textbox)] =
    pdf.pages.slice(startpage, startpage + pagecount)
      .flatMap(p => p.boxes.map(b => (p.number, b)))

  // ------------------------------------------------------- counting
  def countHorizontalMargins(startpage: Int,
                             pagecount: Int): Map[String, Counter] = {
    val counters = setupHorizontalCounters()
    textboxes(startpage, pagecount).foreach { case (pagenumber, tb) =>
      countHorizontalTextbox(pagenumber, tb, counters)
    }
    pdf.pages.slice(startpage, startpage + pagecount)
      .foreach(p => inc(counters("pagewidth"), p.width))
    counters
  }

  private def setupHorizontalCounters(): Map[String, Counter] = {
    val base = Map("leftmargin" -> newCounter, "rightmargin" -> newCounter,
      "pagewidth" -> newCounter)
    if (twopage)
      base + ("leftmargin_even" -> newCounter) +
        ("rightmargin_even" -> newCounter)
    else base
  }

  private def countHorizontalTextbox(pagenumber: Int, tb: Textbox,
                                     counters: Map[String, Counter]): Unit =
    if (twopage && pagenumber % 2 == 0) {
      inc(counters("leftmargin_even"), tb.left)
      inc(counters("rightmargin_even"), tb.right)
    } else {
      inc(counters("leftmargin"), tb.left)
      inc(counters("rightmargin"), tb.right)
    }

  def countVerticalMargins(startpage: Int,
                           pagecount: Int): Map[String, Counter] = {
    val counters = Map("topmargin" -> newCounter,
      "bottommargin" -> newCounter, "pageheight" -> newCounter)
    textboxes(startpage, pagecount).foreach { case (_, tb) =>
      val len = tb.text.trim.length
      inc(counters("topmargin"), tb.top, len)
      inc(counters("bottommargin"), tb.bottom, len)
    }
    pdf.pages.slice(startpage, startpage + pagecount)
      .foreach(p => inc(counters("pageheight"), p.height))
    counters
  }

  /** count_styles (pdfanalyze.py:389-398): character-weighted usage of
    * each (family, size) tuple, insertion-ordered. */
  def countStyles(startpage: Int, pagecount: Int)
      : mutable.LinkedHashMap[(String, Int), Long] = {
    val c = mutable.LinkedHashMap.empty[(String, Int), Long]
    textboxes(startpage, pagecount).foreach { case (_, tb) =>
      val f = pdf.fontspec(tb.fontid)
      val key = (f.family, f.size)
      c(key) = c.getOrElse(key, 0L) + tb.text.trim.length
    }
    c
  }

  // ------------------------------------------------------- analysis
  /** analyze_vertical_margins (pdfanalyze.py:400-424): walk down from
    * the page top accumulating character mass until it exceeds the
    * header threshold (max share of all text allowed in the header
    * zone); symmetrically up from the bottom for the footer. */
  def analyzeVerticalMargins(v: Map[String, Counter]): Map[String, Int] = {
    val total = v("topmargin").values.sum
    val maxPageheight = v("pageheight").keys.max
    val headerMax = headerSignificanceThreshold * total
    var charcount = 0L
    var header = headerMax.toInt // reference fallback (never hit when
                                 // text exists below every candidate i)
    var i = 0
    var done = false
    while (i < maxPageheight && !done) {
      charcount += v("topmargin").getOrElse(i, 0L)
      if (charcount > headerMax) { header = i - 1; done = true }
      i += 1
    }
    val footerMax = footerSignificanceThreshold * total // NB: the
    // reference sizes the footer threshold from the TOPMARGIN mass too
    charcount = 0L
    var footer = footerMax.toInt
    done = false
    i = maxPageheight - 1
    while (i >= 0 && !done) {
      charcount += v("bottommargin").getOrElse(i, 0L)
      if (charcount > footerMax) { footer = i + 1; done = true }
      i -= 1
    }
    Map("topmargin" -> header, "bottommargin" -> footer,
      "pageheight" -> maxPageheight)
  }

  /** analyze_horizontal_margins (pdfanalyze.py:427-446). */
  def analyzeHorizontalMargins(h: Map[String, Counter]): Map[String, Int] = {
    val out = mutable.LinkedHashMap.empty[String, Int]
    val pagewidth = mostCommon(h("pagewidth")).head._1
    val midpage = pagewidth / 2.0
    def filtered(c: Counter, keep: Int => Boolean): Counter = {
      val n = newCounter
      c.foreach { case (k, cnt) => if (keep(k)) n(k) = cnt }
      n
    }
    val l = filtered(h("leftmargin"), _ < midpage)
    val r = filtered(h("rightmargin"), _ > midpage)
    if (l.nonEmpty)
      out("leftmargin") = findmargin(l, Floor, quantize = scannedSource)
    if (r.nonEmpty)
      out("rightmargin") = findmargin(r, Ceil, quantize = true)
    if (twopage) {
      val le = filtered(h("leftmargin_even"), _ < midpage)
      val re = filtered(h("rightmargin_even"), _ > midpage)
      if (le.nonEmpty)
        out("leftmargin_even") =
          findmargin(le, Floor, quantize = scannedSource)
      if (re.nonEmpty)
        out("rightmargin_even") = findmargin(re, Ceil, quantize = true)
    }
    out("pagewidth") = h("pagewidth").keys.max
    out.toMap
  }

  sealed trait Trunc
  case object Floor extends Trunc
  case object Ceil extends Trunc

  /** findmargin (pdfanalyze.py:457-498): mode of the counter, or — for
    * quantized margins — bin to 10-pt resolution, collect every bin
    * within 80% of the strongest bin's count, and take the outermost
    * candidate (max for right edges / ceil, min for left / floor). */
  def findmargin(counter: Counter, trunc: Trunc,
                 quantize: Boolean): Int =
    if (!quantize) mostCommon(counter).head._1
    else {
      val binsize = 10
      val lowres = newCounter
      counter.foreach { case (v, cnt) =>
        val bin = trunc match {
          case Floor => math.floor(v.toDouble / binsize).toInt
          case Ceil => math.ceil(v.toDouble / binsize).toInt
        }
        inc(lowres, bin * binsize, cnt)
      }
      val ranked = mostCommon(lowres)
      val threshold = ranked.head._2 * 0.8
      val candidates = mutable.ArrayBuffer.empty[Int]
      var result = Option.empty[Int]
      val it = ranked.iterator
      while (it.hasNext && result.isEmpty) {
        val (v, cnt) = it.next()
        if (cnt < threshold)
          result = Some(trunc match {
            case Ceil => candidates.max
            case Floor => candidates.min
          })
        else candidates += v
      }
      result.getOrElse(candidates.head) // every bin cleared the bar
    }

  /** fontsize_key (pdfanalyze.py:502-510): (size, weight) with
    * Bold=2 > Italic=1 > regular. */
  def fontsizeKey(fonttuple: (String, Int)): (Int, Int) = {
    val (family, size) = fonttuple
    val weight =
      if (family.contains("Bold")) 2
      else if (family.contains("Italic")) 1
      else 0
    (size, weight)
  }

  /** analyze_styles (pdfanalyze.py:516-549): default = most-used
    * style; h1-h3 = larger-than-default styles with significant use,
    * largest first; footnoteref = the smallest significantly-used
    * same-family style at most half the default size. */
  def analyzeStyles(styles: mutable.LinkedHashMap[(String, Int), Long])
      : Map[String, (String, Int)] = {
    if (styles.isEmpty) return Map.empty
    val out = mutable.LinkedHashMap.empty[String, (String, Int)]
    val ds = styles.toSeq.sortBy(-_._2).head._1
    out("default") = ds

    val significantuse = styles.values.sum * styleSignificanceThreshold
    val sortedstyles = styles.keys.toSeq
      .sortBy(fontsizeKey)(implicitly[Ordering[(Int, Int)]].reverse)
    val largestyles = mutable.Queue.empty[(String, Int)]
    sortedstyles.foreach { x =>
      if (Ordering[(Int, Int)].gt(fontsizeKey(x), fontsizeKey(ds)) &&
          styles(x) > significantuse)
        largestyles += x
    }
    sortedstyles.reverseIterator.find { x =>
      styles(x) > significantuse && x._1 == ds._1 && x._2 <= ds._2 / 2.0
    }.foreach(fnrs => out("footnoteref") = fnrs)

    Seq("h1", "h2", "h3").foreach { role =>
      if (largestyles.nonEmpty) out(role) = largestyles.dequeue()
    }
    out.toMap
  }

  /** metrics (pdfanalyze.py:237-323) minus the JSON/plot caching I/O:
    * margin ints plus style dicts, flattened here to
    * `style -> (family, size)` pairs alongside the int metrics. */
  def metrics(startpage: Int = 0, pagecount0: Int = -1)
      : (Map[String, Int], Map[String, (String, Int)], Boolean) = {
    val pagecount =
      if (pagecount0 < 0) pdf.pages.length - startpage else pagecount0
    val h = analyzeHorizontalMargins(
      countHorizontalMargins(startpage, pagecount))
    val v = analyzeVerticalMargins(
      countVerticalMargins(startpage, pagecount))
    val s = analyzeStyles(countStyles(startpage, pagecount))
    (h ++ v, s, scannedSource)
  }

  // ------------------------------------------------------ pagination
  /** guess_pagenumber_boxes (pdfanalyze.py:211-216): the last 5 and
    * first 5 boxes of the page, filtered to fonts at least
    * pagination_min_size (footnote markers are smaller). */
  def guessPagenumberBoxes(boxes: Vector[Textbox]): Seq[Textbox] =
    (boxes.reverse.take(5) ++ boxes.take(5))
      .filter(b => pdf.fontspec(b.fontid).size >= paginationMinSize)

  private val RomanRe =
    "^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})$".r

  def isRoman(s: String): Boolean =
    s.nonEmpty && RomanRe.matches(s.toUpperCase)

  /** guess_pagenumber_candidates (pdfanalyze.py:189-208): plain
    * integers (year-like values gated), roman numerals on page 1 or
    * while the expected number is roman. Left = arabic, Right =
    * roman. */
  def guessPagenumberCandidates(pageNumber: Int, boxes: Vector[Textbox],
      probable: Either[Int, String]): Seq[Either[Int, String]] = {
    val out = mutable.ArrayBuffer.empty[Either[Int, String]]
    guessPagenumberBoxes(boxes).foreach { box =>
      box.els.foreach { el0 =>
        val el = el0.text.trim
        val yearGate = probable.left.exists(_ >= 1900)
        if (el.matches("[0-9]+") && (el.toLong < 1900 || yearGate))
          out += Left(el.toInt)
        else if ((pageNumber == 1 || probable.isRight) && isRoman(el))
          out += Right(el)
      }
    }
    out.toSeq
  }

  /** guess_pagenumber_select (pdfanalyze.py:219-235). */
  def guessPagenumberSelect(candidates: Seq[Either[Int, String]],
      probable: Either[Int, String]): Option[Either[Int, String]] = {
    if (candidates.contains(probable)) return Some(probable)
    if (candidates.exists(_.isRight)) return candidates.headOption
    val p = probable.left.getOrElse(return candidates.headOption)
    candidates.collect { case Left(i) => i }.sorted.find(_ >= p).map(Left(_))
  }

  def guessPagenumber(pageNumber: Int, boxes: Vector[Textbox],
      probable: Either[Int, String]): Option[Either[Int, String]] = {
    val cs = guessPagenumberCandidates(pageNumber, boxes, probable)
    if (cs.nonEmpty) guessPagenumberSelect(cs, probable) else None
  }

  /** paginate (pdfanalyze.py:114-179): map each physical page to its
    * printed page number, tolerating single missed guesses (a numbered
    * heading on an unpaginated page) the way the reference does. */
  def paginate(src: String = "doc.pdf"): Seq[(String, Either[Int, String])] = {
    val guesses = mutable.ArrayBuffer.empty[(String, Either[Int, String])]
    val mapping = mutable.LinkedHashMap.empty[String, Either[Int, String]]
    var currentpage: Either[Int, String] = Left(0)
    var misguess = 0
    var lastpagenumber = 0
    pdf.pages.foreach { page =>
      val physical = s"$src#page=${page.number}"
      val pageskip = page.number - lastpagenumber
      lastpagenumber = page.number
      currentpage = currentpage match {
        case Left(i) => Left(i + pageskip)
        case Right(r) =>
          Right(Selectors.toRoman(Selectors.fromRoman(r) + pageskip)
            .toLowerCase)
      }
      guessPagenumber(page.number, page.boxes, currentpage) match {
        case None =>
          guesses += ((physical, currentpage))
        case Some(guess) =>
          if (guess != currentpage) {
            (currentpage, guess) match {
              case (Left(cur), Left(g)) if cur - g != misguess =>
                misguess = g - cur
                guesses += ((physical, guess))
              case (Left(_), Left(g)) =>
                // pagination resumed after a double mis-guess: repair
                // the previous guess and trust this one
                guesses.lastOption.foreach { case (prevphys, _) =>
                  guesses.remove(guesses.length - 1)
                  mapping(prevphys) = Left(g - 1)
                }
                mapping(physical) = Left(g)
                misguess = 0
              case _ => () // roman/arabic mix — warn-only upstream
            }
          } else misguess = 0
          mapping(physical) = guess
          currentpage = guess
      }
    }
    // unguessable pages get their assumed numbers (the reference's
    // final overwrite loop; repaired entries were popped from guesses)
    guesses.foreach { case (phys, g) => mapping(phys) = g }
    mapping.toSeq
  }
}
