package graft.parse

import java.util.regex.{Matcher, Pattern}

/** MYNDIGHETSBESLUT citation parser — Swedish agency-decision references
  * (ARN consumer-board case numbers, JO parliamentary-ombudsman dnr, JK
  * chancellor-of-justice dnr), the reference's
  * LegalRef(MYNDIGHETSBESLUT) mode
  * (/root/reference/ferenda/sources/legal/se/res/ebnf/avg.ebnf;
  * formatter legalref.py:1419-1446). Golden-tested against the
  * reference's own Avg fixture suite in LawRefGoldenSpec.
  *
  * Kept semantics:
  *  - only the diarienummer links; preambles ("JO 2013/14 s. 392, dnr ",
  *    "avgörande 1999-01-12; ", "JK-beslut den 4 april 2003, dnr ")
  *    stay text;
  *  - series from the preamble shape: ARN ids are ÅÅÅÅ-NNNN after an
  *    "avgörande <ISO date>; " or "ARN:s änr " preamble; JO ids are
  *    NNNN-ÅÅÅÅ after a "JO <riksmöte> s. <n>, dnr " or "JO:s beslut
  *    den <datum>, dnr " preamble; JK ids are N{1,4}-ÅÅ-TT after
  *    "dnr "/"ärende nr " (optionally preceded by a beslut preamble);
  *  - a JK-shaped id that is PROBABLY A DATE (ordinal 1980-2099, month
  *    1-12, day ≤31 — legalref.py:1431-1436) stays text ("… beslut
  *    2002-12-02 i ärende med dnr …");
  *  - "dnr" lists chain with och/eller/samt (and ARN with ';'/',').
  */
object AvgRef {

  final case class Conf(base: String = "https://lagen.nu/")

  private def re(p: String): Pattern = CitationScanner.re(p)

  private val IsoDate = "[0-9]{4}-[0-9]{2}-[0-9]{2}"
  private val Datum = "[0-9]{1,2}\\s+[\\p{L}]+\\s+[0-9]{4}"

  private val ArnPreA = re(s"avgörande\\s+$IsoDate;\\s+")
  private val ArnPreB = re("ARN:s\\s+änr\\s+")
  private val ArnId = re("([0-9]{4}-[0-9]{4,})(?![0-9])")
  private val ArnSep = re("(;\\s+|,\\s+|\\s+och\\s+)")

  private val JoPreA = re("JO\\s+[0-9]{4}/[0-9]{2,4}\\s+s\\.\\s+[0-9]+,\\s+dnr\\s+")
  private val JoPreB = re(s"JO:s\\s+beslut\\s+den\\s+$Datum,\\s+dnr\\s+")
  private val JoId = re("([0-9]+-[0-9]{4})(?![0-9-])")

  private val JkDnr = re("[Dd]nr\\s+")
  /** "ärende nr " is an INLINE literal in the reference's JKRefs
    * production (avg.ebnf) — inline literals produce no taglist nodes,
    * so the reference's serializer DROPS the text from its output (the
    * jk-basic fixture); DnrW is a named production and survives. */
  private val JkArende = re("ärende\\s+nr\\s+")
  private val JkId = re("([0-9]{1,4})-([0-9]{2})-([0-9]{1,2})(?![0-9-])")
  private val Conj = re("\\s+(och|eller|samt)\\s+")

  /** legalref.py:1431-1436: a JK-shaped dnr that is probably a DATE must
    * not link (fixed 2099 horizon instead of today() for determinism). */
  private def jkLooksLikeDate(ord: Int, month: Int, day: Int): Boolean =
    ord >= 1980 && ord <= 2099 && month >= 1 && month <= 12 && day <= 31

  final class Parser(conf: Conf = Conf()) extends CitationScanner {



    def parse(text: String): Vector[LawRef.Seg] = {
      s = text
      val out = Vector.newBuilder[LawRef.Seg]
      val plain = new StringBuilder
      def flush(): Unit =
        if (plain.nonEmpty) { out += LawRef.Seg(plain.toString); plain.clear() }

      /** id list: preamble already consumed into plain; returns end. */
      def idList(start: Int, idPat: Pattern, sepPat: Pattern,
                 series: String): Int = {
        var p = start
        var first = true
        var go = true
        while (go) {
          val entry =
            if (first) at(idPat, p).map(m => (p, m))
            else for {
              sep <- at(sepPat, p)
              m <- at(idPat, sep.end)
            } yield (sep.end, m)
          entry match {
            case Some((idFrom, m)) =>
              plain.append(s.substring(p, idFrom))
              flush()
              val linked =
                if (series == "jk")
                  !jkLooksLikeDate(m.group(1).toInt, m.group(2).toInt,
                    m.group(3).toInt)
                else true
              out += LawRef.Seg(s.substring(idFrom, m.end),
                if (linked) Some(s"${conf.base}avg/$series/${m.group(0)}")
                else None)
              p = m.end
              first = false
            case None => go = false
          }
        }
        p
      }

      var p = 0
      while (p < s.length) {
        val c = s.charAt(p)
        var np = -1
        if (boundary(p)) {
          if (c == 'a' || c == 'A') {
            at(ArnPreA, p).orElse(at(ArnPreB, p)).foreach { m =>
              if (at(ArnId, m.end).isDefined) {
                plain.append(s.substring(p, m.end))
                np = idList(m.end, ArnId, ArnSep, "arn")
              }
            }
          }
          if (np < 0 && c == 'J') {
            at(JoPreA, p).orElse(at(JoPreB, p)).foreach { m =>
              if (at(JoId, m.end).isDefined) {
                plain.append(s.substring(p, m.end))
                np = idList(m.end, JoId, Conj, "jo")
              }
            }
          }
          if (np < 0 && (c == 'd' || c == 'D')) {
            at(JkDnr, p).foreach { m =>
              if (at(JkId, m.end).isDefined) {
                plain.append(s.substring(p, m.end)) // DnrW text survives
                np = idList(m.end, JkId, Conj, "jk")
              }
            }
          }
          if (np < 0 && c == 'ä') {
            at(JkArende, p).foreach { m =>
              if (at(JkId, m.end).isDefined) {
                // inline-literal text dropped (see JkArende doc)
                np = idList(m.end, JkId, Conj, "jk")
              }
            }
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
