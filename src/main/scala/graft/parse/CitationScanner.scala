package graft.parse

import java.util.regex.{Matcher, Pattern}

/** Shared scanner scaffolding for the citation-family parsers (LawRef,
  * ForarbRef, RattsfallRef, EuActRef, AvgRef): anchored regex matching
  * over the current input, word-boundary checks, and the adjacent-plain-
  * segment merge (the reference's normres concatenation pass). One copy —
  * a guard or whitespace-class fix lands everywhere at once. */
private[parse] trait CitationScanner {

  /** The text currently being scanned (set by each parse call). */
  protected var s: String = ""

  /** Anchored match at `pos`; out-of-range positions (e.g. a failed
    * lookahead feeding -1) are simply no-matches, never exceptions. */
  protected def at(p: Pattern, pos: Int): Option[Matcher] = {
    if (pos < 0 || pos > s.length) return None
    val m = p.matcher(s)
    m.region(pos, s.length)
    m.useTransparentBounds(true)
    if (m.lookingAt()) Some(m) else None
  }

  protected def boundary(pos: Int): Boolean =
    pos == 0 || !Character.isLetterOrDigit(s.charAt(pos - 1))

  /** Concatenate adjacent plain segments (the reference's normres pass). */
  protected def mergePlain(segs: Vector[LawRef.Seg]): Vector[LawRef.Seg] =
    segs.foldLeft(Vector.empty[LawRef.Seg]) { (acc, seg) =>
      acc.lastOption match {
        case Some(last) if last.uri.isEmpty && seg.uri.isEmpty =>
          acc.init :+ LawRef.Seg(last.text + seg.text)
        case _ => acc :+ seg
      }
    }
}

private[parse] object CitationScanner {
  /** Pattern compiler treating NBSP (0xA0) as whitespace — the
    * reference's base.ebnf Whitespace class contains a literal A0 byte. */
  def re(p: String): Pattern =
    Pattern.compile(p.replace("\\s", "[\\s\\u00a0]"))
}
