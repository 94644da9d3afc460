package graft.parse

import java.util.regex.{Matcher, Pattern}

/** RATTSFALL citation parser — Swedish court-report references (NJA, RÅ,
  * AD, RH, MÖD, …), the reference's LegalRef(RATTSFALL) mode
  * (/root/reference/ferenda/sources/legal/se/res/ebnf/rattsfall.ebnf;
  * formatter legalref.py:1376-1389). Golden-tested against the
  * reference's own DV fixture suite in LawRefGoldenSpec.
  *
  * Grammar kept exactly: referat form COURT YEAR sep NUMBER where sep is
  * ((ws|-)('ref'|'nr')'.'? ws?) or (ws? (:|-) ws?) — tolerant of the
  * in-the-wild malformations the tricky fixture collects; NJA has ONLY
  * the page form ("NJA 1998 s. 14") and the notis form ("NJA 2007 not
  * 19") — "NJA 2003:16" is intentionally NOT a citation; notis form
  * COURT YEAR 'not''.'? NUMBER. URI shapes: dom/{court}/{year}:{no},
  * dom/nja/{year}s{page}, dom/{court}/{year}/not/{no}, court slugs
  * ASCII-folded lowercase (RÅ → ra, MÖD → mod). */
object RattsfallRef {

  final case class Conf(base: String = "https://lagen.nu/")

  private def re(p: String): Pattern = CitationScanner.re(p)

  private val Courts = "RÅ|AD|RH|RK|MÖD|MMD|MIG|MD|HFD|PMÖD"
  private val Sep =
    "(?:(?:\\s|-)(?:ref|nr)\\.?\\s?|\\s?[:-]\\s?)"
  private val Referat = re(
    s"($Courts)\\s+([0-9]{4})$Sep([0-9]+)(?![\\p{L}0-9])")
  private val Notis = re(
    s"($Courts|NJA)\\s+([0-9]{4})\\s+not\\.?\\s?([0-9]+)(?![\\p{L}0-9])")
  private val NjaPage = re(
    s"(NJA)\\s+([0-9]{4})\\s+s\\.?\\s?([0-9]+)(?![\\p{L}0-9])")

  private def slug(court: String): String =
    court.toLowerCase.replace("å", "a").replace("ä", "a").replace("ö", "o")

  final class Parser(conf: Conf = Conf()) extends CitationScanner {



    def parse(text: String): Vector[LawRef.Seg] = {
      s = text
      val out = Vector.newBuilder[LawRef.Seg]
      val plain = new StringBuilder
      def flush(): Unit =
        if (plain.nonEmpty) { out += LawRef.Seg(plain.toString); plain.clear() }
      var p = 0
      while (p < s.length) {
        val hit: Option[(Int, String)] =
          if (!boundary(p)) None
          else at(Notis, p).map(m =>
            (m.end, s"dom/${slug(m.group(1))}/${m.group(2)}/not/${m.group(3)}"))
          .orElse(at(NjaPage, p).map(m =>
            (m.end, s"dom/nja/${m.group(2)}s${m.group(3)}")))
          .orElse(at(Referat, p).map(m =>
            (m.end, s"dom/${slug(m.group(1))}/${m.group(2)}:${m.group(3)}")))
        hit match {
          case Some((np, path)) =>
            flush()
            out += LawRef.Seg(s.substring(p, np), Some(conf.base + path))
            p = np
          case None =>
            plain.append(s.charAt(p))
            p += 1
        }
      }
      flush()
      mergePlain(out.result())
    }
  }
}
