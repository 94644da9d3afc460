package graft.parse

import java.util.regex.Pattern
import graft.parse.PdfReader.{FontSpec, Textbox}

/** The official-print (offtryck) paragraph glue predicate — the shared
  * textbox-merging brain behind the reference's proposition/SOU/Ds
  * structure parsing (`Offtryck.get_gluefunc`,
  * /root/reference/ferenda/sources/legal/se/offtryck.py:212-376),
  * ported rule-for-rule:
  *
  *  - tesseract paragraph ids glue unconditionally (hOCR parid);
  *  - scanned sources get tolerant size/align/valign matchers, native
  *    sources exact ones plus the unreliable-font-family heuristics
  *    (regeringen.se PDFs carry bogus fontspec ids — skipped-empty
  *    markers, "N §" bold starts, normalized family equality);
  *  - bullets/dashes start new chunks; U+F0B7 (symbol-font bullet)
  *    relaxes size and valign; bullet continuations allow a 30pt
  *    indent when lowercase;
  *  - large-font fragments glue HORIZONTALLY when vertically centered
  *    on the previous box (split numbered headings);
  *  - hard paragraph starters: lone section references
  *    ("4 kap. 9 c och 10 §§"), "Skälen för min bedömning/mitt
  *    förslag:", ordered/alphabetized list items, "N §" after a real
  *    line gap, italic "dels" preamble items;
  *  - the final vertical-proximity + left-alignment/hanging-indent
  *    clause, with the wide-gap short-box page-number exception.
  *
  * The reference mutates textbox.lines/lineheight inside the predicate
  * for the commentary pass's linespacing statistics; graft's
  * [[PdfReader.Textbox]] is immutable, so [[verdict]] REPORTS which
  * branch matched (none / heading-glue without a line switch / normal
  * glue / parid glue) and the token-stream fold applies the same
  * bookkeeping (offtryck.py:247-255, 321, 371-373). */
object OfftryckGlue {

  /** [[verdict]] outcomes. */
  final val NoGlue = 0
  /** Heading fragments on the SAME line — glue without counting a
    * line switch (offtryck.py:321-323). */
  final val GlueSameLine = 1
  /** Normal vertical glue — count a line, running-average lineheight
    * (offtryck.py:371-373). */
  final val GlueNewLine = 2
  /** tesseract-parid glue — counts a line with the reference's own
    * uncorrected-precedence average (offtryck.py:253-255). */
  final val GlueParid = 3

  private def reMatch(p: String, s: String): Boolean =
    Pattern.compile(p).matcher(s).lookingAt()

  private val SectionRef =
    Pattern.compile("(\\d+ kap. |)\\d+( \\w och \\d+| \\w| och \\d+|) §§?$")

  /** offtryck_gluefunc, closed over the document's fontspec table and
    * the analyzer's scanned_source flag. */
  def gluefunc(fontspec: Map[Int, FontSpec], scannedSource: Boolean)
      : (Textbox, Textbox, Textbox) => Boolean = {
    val v = verdict(fontspec, scannedSource)
    (t, n, p) => v(t, n, p) != NoGlue
  }

  /** The same predicate reporting WHICH branch matched. */
  def verdict(fontspec: Map[Int, FontSpec], scannedSource: Boolean)
      : (Textbox, Textbox, Textbox) => Int = {
    def font(b: Textbox): FontSpec = fontspec(b.fontid)

    def normalizeFamily(f: String): String =
      f.replaceAll("[\\-,](Italic|Bold|BoldItalic)", "")

    /** offtryck.py:216-239 — older native regeringen.se PDFs carry
      * very unreliable font information. */
    def unreliableFamilymatch(prevbox: Textbox, nextbox: Textbox): Boolean = {
      val nextFirst = nextbox.els.headOption
      if (nextFirst.exists(_.skippedEmpty.isDefined)) true
      else if (prevbox.els.length > 1 &&
               prevbox.els.head.tag.contains("b") &&
               reMatch("\\d+(| \\w) §", prevbox.els.head.text) &&
               !nextFirst.exists(_.text.headOption.exists(_.isUpper))) true
      else if (normalizeFamily(font(prevbox).family) ==
                 normalizeFamily(font(nextbox).family) &&
               !nextFirst.exists(_.text.headOption.exists(_.isUpper))) true
      else font(prevbox).family == "Symbol" ||
        font(prevbox).family == font(nextbox).family
    }

    (textbox: Textbox, nextbox: Textbox, prevbox: Textbox) => {
      // bboxes for scanned material are very tight, so lines appear to
      // have greater linespacing
      val linespacing = font(nextbox).size / 1.2
      val parindent = font(nextbox).size
      // tesseract's own paragraph segmentation wins outright
      if (prevbox.parid.isDefined && prevbox.parid == nextbox.parid)
        GlueParid
      else {
        val strtextbox = textbox.text.trim
        val strprevbox = prevbox.text.trim
        val strnextbox = nextbox.text.trim

        var sizematch: (Textbox, Textbox) => Boolean =
          if (scannedSource) {
            // font size calculation is highly unreliable for single
            // chars in scans
            if (strnextbox.length == 1)
              (p, n) => math.abs(font(p).size - font(n).size) <= 4
            else (p, n) => math.abs(font(p).size - font(n).size) <= 1
          } else (p, n) => font(p).size == font(n).size
        val alignmatchDefault: (Textbox, Textbox) => Boolean =
          (p, n) => math.abs(p.left - n.left) <= 2
        var alignmatch = alignmatchDefault
        var valignmatch: (Textbox, Textbox) => Boolean =
          if (scannedSource)
            (p, n) => math.abs(p.bottom - n.bottom) <= 3 ||
              math.abs(p.top - n.top) <= 3
          else (p, n) => p.bottom == n.bottom

        // dir 2016:15 page 15: a lone hyphen box uses another fontsize
        if (strnextbox == "–" || strprevbox == "–")
          sizematch = (_, _) => true

        // a bullet (or dash) always signals the start of a new chunk
        if (strnextbox.startsWith("\u2022") ||
            strnextbox.startsWith("\uf0b7") ||
            strnextbox.startsWith("\u2212")) NoGlue
        else {
          val familymatch: (Textbox, Textbox) => Boolean =
            if (scannedSource) (p, n) => font(p).family == font(n).family
            else unreliableFamilymatch

          // bullet continuations: allow a large (non-hanging) indent
          // when the next line starts lowercase
          var ul = false
          if (strtextbox.startsWith("\u2022") ||
              strtextbox.startsWith("\uf0b7") ||
              strtextbox.startsWith("\u2212")) {
            ul = true
            if (strnextbox.headOption.exists(_.isLower))
              alignmatch = (p, n) => n.left - p.left < 30
          }
          if (strtextbox.startsWith("\uf0b7")) {
            // U+F0B7 is private use — probably a symbol-font bullet:
            // accept any family/size change and a slight valign slip
            sizematch = (_, _) => true
            valignmatch = (p, n) => math.abs(p.bottom - n.bottom) <= 1
          }

          // split numbered headings glue HORIZONTALLY: vertical
          // centers overlap and the gap is bounded (offtryck.py:308-324)
          val headingGlue = font(nextbox).size > 13 &&
            sizematch(textbox, nextbox) &&
            familymatch(textbox, nextbox) &&
            nextbox.top < prevbox.top + prevbox.height / 2.0 &&
            prevbox.top + prevbox.height / 2.0 < nextbox.bottom &&
            textbox.left - prevbox.right < prevbox.width * 3

          if (headingGlue) GlueSameLine
          // a line that ONLY contains a section reference is a header
          else if ((SectionRef.matcher(strprevbox).matches() ||
                    SectionRef.matcher(strnextbox).matches()) &&
                   prevbox.bottom <= nextbox.top) NoGlue
          // locutions that indicate a new paragraph
          else if (reMatch(
            "Skälen för (min bedömning|mitt förslag): ", strnextbox)) NoGlue
          else if (reMatch("\\d\\. +", strnextbox)) NoGlue // ordered list
          else if (reMatch("[a-z]\\) +", strnextbox)) NoGlue // alpha list
          else if (reMatch("\\d+ §", strnextbox) &&
                   // not really a continuation…
                   !strprevbox.lastOption.exists(c => c == '–' || c == '-') &&
                   !Seq("och", "enligt", "kap.", "lagens", "före", "i")
                     .exists(strprevbox.endsWith) &&
                   // …and a real line gap (30% of a line)
                   nextbox.top - prevbox.bottom >=
                     font(prevbox).size * 0.3) NoGlue
          // italic "dels": itemized list form in act preambles
          else if (nextbox.els.headOption.exists(e =>
                     e.tag.contains("i") &&
                       e.text.startsWith("dels"))) NoGlue
          // the final, primarily horizontal, glue clause
          else if (sizematch(textbox, nextbox) &&
                   familymatch(textbox, nextbox) &&
                   textbox.top + textbox.height + linespacing > nextbox.top &&
                   (prevbox.left < nextbox.right ||
                     textbox.left < parindent * 2 + nextbox.left) &&
                   (valignmatch(prevbox, nextbox) || // baseline, not topline
                     alignmatch(prevbox, nextbox) || // prev line vs next
                     alignmatch(textbox, nextbox) || // glued-so-far vs next
                     (parindent * 2 >= prevbox.left - nextbox.left &&
                       prevbox.left - nextbox.left >= parindent / 2.0) ||
                     (!ul &&
                       parindent * 2 >= textbox.left - nextbox.left &&
                       textbox.left - nextbox.left >= parindent / 2.0) ||
                     // hanging-indent (numbered) heading
                     (reMatch("[\\d\\.]+\\s+[A-ZÅÄÖ]", strtextbox) &&
                       nextbox.left - textbox.left < parindent * 5))) {
            // same line but a wide gap before a short box: page number
            if (valignmatch(prevbox, nextbox) &&
                nextbox.left - textbox.right > 50 && strnextbox.length < 10)
              NoGlue
            else GlueNewLine
          } else NoGlue
        }
      }
    }
  }
}
