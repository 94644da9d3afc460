package graft.parse

import java.util.regex.{Matcher, Pattern}

/** EULAGSTIFTNING citation parser — EU directives/regulations cited in
  * Swedish legal text, the reference's LegalRef(EULAGSTIFTNING) mode
  * (/root/reference/ferenda/sources/legal/se/res/ebnf/eulag.ebnf;
  * formatter legalref.py:1316-1374). Golden-tested against the
  * reference's own EGLag fixture suite in LawRefGoldenSpec.
  *
  * Kept semantics:
  *  - full act refs (institution + akttyp + id, optional "av den <date>"
  *    tail) link the WHOLE span; bare ids ("95/46/EG", "(EG) nr 1488/94")
  *    link only the id, leaving a bare "direktiv " prefix plain (the
  *    grammar's DirektivRefID/ForordningRefID branches);
  *  - "artikel N[.M] i <act>" links the whole phrase with fragment #N.M;
  *    a bare "artikel N" without an act is context-dependent and stays
  *    text (eulag_format_uri raises, format_generic_link returns text);
  *  - CELEX construction: sector 3 + year (two-digit years are 19xx) +
  *    L/R + %04d serial; the 2015 year/serial order flip is detected via
  *    the act's date ("(EU) 2016/679 av den 27 april 2016" → 32016R0679,
  *    legalref.py:1338-1356).
  */
object EuActRef {

  final case class Conf(base: String = "https://lagen.nu/")

  private def re(p: String): Pattern = CitationScanner.re(p)

  private val Inst =
    "(?:Europaparlamentets\\s+och\\s+rådets|rådets|kommissionens)"
  private val DirId = "([0-9]{1,4})/([0-9]+)/(EU|EG|EEG)"
  private val ForId = "\\((EU|EG|EEG)\\)(?:\\s+nr)?\\s+([0-9]+)/([0-9]{1,4})"
  private val AvDatum =
    "\\s+av\\s+den\\s+[0-9]{1,2}\\s+[\\p{L}]+\\s+([0-9]{4})"

  private val FullDir = re(
    s"$Inst\\s+direktiv\\s+$DirId(?:$AvDatum)?(?![\\p{L}0-9])")
  private val FullFor = re(
    s"$Inst\\s+förordning\\s+$ForId(?:$AvDatum)?(?![\\p{L}0-9])")
  private val BareDir = re(s"$DirId(?![\\p{L}0-9])")
  private val BareFor = re(s"$ForId(?![\\p{L}0-9])")
  private val Artikel = re(
    "artikel\\s+([0-9]+)(?:\\.([0-9]+))?(?![\\p{L}0-9])")
  private val ArtikelIn = re("\\s+i\\s+")

  /** CELEX from (year, serial, form) with two-digit-year expansion and
    * the post-2015 order flip (detected via the act date's year). */
  private def celex(ar0: String, lop0: String, form: Char,
                    dateYear: Option[String]): String = {
    var ar = ar0
    var lop = lop0
    val realYear = dateYear.map(_.toInt).getOrElse(0)
    if (lop.toInt > 2014 && realYear > 2014) { val t = ar; ar = lop; lop = t }
    if (ar.length == 2) ar = "19" + ar
    f"3$ar$form${lop.toInt}%04d"
  }

  final class Parser(conf: Conf = Conf()) extends CitationScanner {



    /** Act starting at pos → (end, celex). */
    private def tryAct(pos: Int): Option[(Int, String)] =
      at(FullDir, pos).map(m =>
        (m.end, celex(m.group(1), m.group(2), 'L', Option(m.group(4)))))
      .orElse(at(FullFor, pos).map(m =>
        (m.end, celex(m.group(3), m.group(2), 'R', Option(m.group(4))))))
      .orElse(at(BareFor, pos).map(m =>
        (m.end, celex(m.group(3), m.group(2), 'R', None))))
      .orElse(at(BareDir, pos).map(m =>
        (m.end, celex(m.group(1), m.group(2), 'L', None))))

    def parse(text: String): Vector[LawRef.Seg] = {
      s = text
      val out = Vector.newBuilder[LawRef.Seg]
      val plain = new StringBuilder
      def flush(): Unit =
        if (plain.nonEmpty) { out += LawRef.Seg(plain.toString); plain.clear() }
      def link(from: Int, to: Int, celexId: String, frag: String = ""): Unit = {
        flush()
        out += LawRef.Seg(s.substring(from, to),
          Some(s"${conf.base}ext/celex/$celexId$frag"))
      }
      var p = 0
      while (p < s.length) {
        val c = s.charAt(p)
        var np = -1
        if (boundary(p)) {
          if (c == 'a') {
            // "artikel N[.M] i <act>" — whole-span link; bare article
            // refs without an act stay text (context-dependent)
            for {
              am <- at(Artikel, p)
              im <- at(ArtikelIn, am.end)
              (ae, cx) <- tryAct(im.end)
            } {
              val frag = "#" + am.group(1) +
                Option(am.group(2)).map("." + _).getOrElse("")
              link(p, ae, cx, frag)
              np = ae
            }
          } else if (c == 'r' || c == 'E' || c == 'k' || c == '(' ||
                     Character.isDigit(c)) {
            tryAct(p).foreach { case (ae, cx) => link(p, ae, cx); np = ae }
          }
        }
        if (np >= 0) p = np
        else { plain.append(c); p += 1 }
      }
      flush()
      mergePlain(out.result())
    }
  }
}
