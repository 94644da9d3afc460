package graft.parse

import java.util.regex.{Matcher, Pattern}

/** FORARBETEN citation parser — Swedish legislative preparatory-works
  * references (propositions, committee reports, parliamentary
  * communications, SOU/Ds inquiry reports, CELEX numbers), the
  * reference's LegalRef(FORARBETEN) mode
  * (/root/reference/ferenda/sources/legal/se/res/ebnf/forarbeten.ebnf;
  * formatter legalref.py:1205-1310). Golden-tested against the
  * reference's own Regpubl fixture suite in LawRefGoldenSpec.
  *
  * Kept semantics:
  *  - prop id forms: standard "1996/97:85" (optional space after the
  *    colon), sub-riksmöte "1958:B 6" (the 'A' series is normalized
  *    away — Prop 1958:A 30 is commonly cited as 1958:30,
  *    legalref.py:1279-1280), old styles "nr 212/1949" and
  *    "1952 nr 187";
  *  - page references: ", s. 51" merges into the citation link
  *    (_concatlinks, legalref.py:1216-1222); ranges and och/eller lists
  *    emit one link per page under the same document (#sidN);
  *  - "a. prop." anaphora resolves to the most recent forarbete
  *    (last_forarbete_attributes, legalref.py:1231-1237);
  *  - short CELEX numbers expand their two-digit year ("392L0100" →
  *    31992L0100, legalref.py:1303-1305).
  */
object ForarbRef {

  final case class Conf(base: String = "https://lagen.nu/")

  private def re(p: String): Pattern = CitationScanner.re(p)

  private val Rm = "[0-9]{4}(?:/[0-9]{2,4})?"
  private val PropStd = re(
    s"([Pp]rop\\.)\\s*($Rm):\\s?(?:([ABU])\\s)?([0-9]+)(?![\\p{L}0-9])")
  private val PropNr = re(
    s"([Pp]rop\\.)\\s+nr\\s+([0-9]+)/([0-9]{4})(?![\\p{L}0-9])")
  private val PropYearNr = re(
    s"([Pp]rop\\.)\\s+([0-9]{4})\\s+nr\\s+([0-9]+)(?![\\p{L}0-9])")
  private val Bet = re(
    s"bet\\.\\s+($Rm):([A-Za-zÅÄÖåäö]{2,3}[0-9]+)(?![\\p{L}0-9])")
  private val Rskr = re(s"rskr\\.\\s+($Rm):([0-9]+)(?![\\p{L}0-9])")
  private val Sou = re(s"SOU\\s+($Rm):([0-9]+)(?![\\p{L}0-9])")
  private val Ds = re(s"Ds\\s+($Rm):([0-9]+)(?![\\p{L}0-9])")
  private val Celex = re("(3[0-9]{2}(?:[0-9]{2})?L[0-9]{4})(?![\\p{L}0-9])")
  private val AnonProp = re("a\\.\\s+prop\\.(?![\\p{L}])")
  /** SidaRef: optional comma, 's' with optional period, page number. */
  private val FirstPage = re(",?\\s+s\\.?\\s+([0-9]+)(?![\\p{L}0-9])")
  private val PageSep = re("(\\s*--?\\s*|,\\s+|\\s+(?:och|eller|samt)\\s+)")
  private val PageNum = re("([0-9]+)(?![\\p{L}0-9:])")

  final class Parser(conf: Conf = Conf()) extends CitationScanner {
    /** last forarbete path ("prop/2002/03:12") — the "a. prop." target. */
    private var last: Option[String] = None



    /** (endPos, docPath) for the citation starting at pos, or None. */
    private def tryRef(pos: Int): Option[(Int, String)] = {
      at(PropStd, pos).foreach { m =>
        val sub = Option(m.group(3)).getOrElse("")
        // 'A' normalized away; B/U kept, space dropped
        val no = (if (sub == "A") "" else sub) + m.group(4)
        return Some((m.end, s"prop/${m.group(2)}:$no"))
      }
      at(PropNr, pos).foreach { m =>
        return Some((m.end, s"prop/${m.group(3)}:${m.group(2)}"))
      }
      at(PropYearNr, pos).foreach { m =>
        return Some((m.end, s"prop/${m.group(2)}:${m.group(3)}"))
      }
      at(Bet, pos).foreach { m =>
        return Some((m.end, s"bet/${m.group(1)}:${m.group(2)}"))
      }
      at(Rskr, pos).foreach { m =>
        return Some((m.end, s"rskr/${m.group(1)}:${m.group(2)}"))
      }
      at(Sou, pos).foreach { m =>
        return Some((m.end, s"sou/${m.group(1)}:${m.group(2)}"))
      }
      at(Ds, pos).foreach { m =>
        return Some((m.end, s"ds/${m.group(1)}:${m.group(2)}"))
      }
      None
    }

    /** Page list after a citation: first page merges into the citation
      * link; later pages (ranges, och/eller lists) link separately. */
    private def emitWithPages(from: Int, refEnd: Int, doc: String,
        out: scala.collection.mutable.Builder[LawRef.Seg, Vector[LawRef.Seg]])
        : Int = {
      at(FirstPage, refEnd) match {
        case Some(fp) =>
          out += LawRef.Seg(s.substring(from, fp.end),
            Some(s"${conf.base}$doc#sid${fp.group(1)}"))
          var p = fp.end
          var go = true
          while (go) {
            val next = for {
              sep <- at(PageSep, p)
              num <- at(PageNum, sep.end)
            } yield (sep, num)
            next match {
              case Some((sep, num)) =>
                out += LawRef.Seg(s.substring(p, num.start))
                out += LawRef.Seg(s.substring(num.start, num.end),
                  Some(s"${conf.base}$doc#sid${num.group(1)}"))
                p = num.end
              case None => go = false
            }
          }
          p
        case None =>
          out += LawRef.Seg(s.substring(from, refEnd),
            Some(s"${conf.base}$doc"))
          refEnd
      }
    }

    def parse(text: String): Vector[LawRef.Seg] = {
      s = text
      val out = Vector.newBuilder[LawRef.Seg]
      val plain = new StringBuilder
      def flush(): Unit =
        if (plain.nonEmpty) { out += LawRef.Seg(plain.toString); plain.clear() }
      var p = 0
      while (p < s.length) {
        val c = s.charAt(p)
        val hit: Option[Int] =
          if (!boundary(p)) None
          else if (c == 'p' || c == 'P' || c == 'b' || c == 'r' ||
                   c == 'S' || c == 'D') {
            tryRef(p).map { case (e, doc) =>
              last = Some(doc)
              flush()
              emitWithPages(p, e, doc, out)
            }
          } else if (c == 'a') {
            (for {
              m <- at(AnonProp, p)
              doc <- last
            } yield { flush(); emitWithPages(p, m.end, doc, out) })
          } else if (c == '3') {
            at(Celex, p).map { m =>
              val id = m.group(1)
              val full = if (id.length == 8) id.head + "19" + id.tail else id
              flush()
              out += LawRef.Seg(s.substring(p, m.end),
                Some(s"${conf.base}ext/celex/$full"))
              m.end
            }
          } else None
        hit match {
          case Some(np) => p = np
          case None => plain.append(c); p += 1
        }
      }
      flush()
      mergePlain(out.result())
    }
  }
}
