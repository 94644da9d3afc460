package graft.parse

import scala.util.matching.Regex

/** Ordered-grammar citation scanner.
  *
  * Semantics from the reference CitationParser
  * (/root/reference/ferenda/citationparser.py:65-165): grammars run in
  * declaration order over a string; spans matched by an earlier grammar are
  * masked from later grammars; each match is formatted into a candidate URI
  * by a per-grammar formatter (uriformatter.py:35-52).
  */
object CitationParser {

  /** One grammar: a regex with named groups + a formatter from captured
    * groups to a candidate URI (possibly doc-relative, starting with "#"). */
  final case class Grammar(
      name: String,
      pattern: Regex,
      groups: Seq[String],
      format: Map[String, String] => String)

  final case class Citation(
      grammar: String,
      matchText: String,
      start: Int,
      end: Int,
      captures: Map[String, String],
      candidateUri: String)

  /** Scan `text`, applying grammars in order; later grammars only see
    * still-unmatched spans (citationparser.py:78-96). */
  def scan(text: String, grammars: Seq[Grammar]): Vector[Citation] = {
    val out = Vector.newBuilder[Citation]
    // matched character mask, grown grammar by grammar
    val taken = new Array[Boolean](text.length)
    def free(s: Int, e: Int): Boolean = { var i = s; while (i < e) { if (taken(i)) return false; i += 1 }; true }
    def mark(s: Int, e: Int): Unit = { var i = s; while (i < e) { taken(i) = true; i += 1 } }
    for (g <- grammars) {
      for (m <- g.pattern.findAllMatchIn(text)) {
        if (free(m.start, m.end)) {
          mark(m.start, m.end)
          val caps = g.groups.flatMap { gn =>
            Option(m.group(gn)).map(gn -> _)
          }.toMap
          out += Citation(g.name, m.matched, m.start, m.end, caps, g.format(caps))
        }
      }
    }
    out.result().sortBy(_.start)
  }

  /** URL grammar (citationpatterns.py:16-36): scheme://rest, with trailing
    * punctuation excluded from the match. Formats to the URL itself (the
    * stock `url` uriformat, uriformats.py:14-20). Runs FIRST so RFC-number
    * grammars never fire inside a URL. */
  val urlGrammar: Grammar = Grammar("URLRef",
    """\b(?:https?|ftp)://[^\s<>"]*[^\s<>".,;:)\]]""".r,
    Seq.empty, _ => "") // candidate URI = matched text; handled in scanUrl

  /** Scan with URL grammar first (mask), then the given grammars. URL
    * citations resolve to the URL text itself. */
  def scanWithUrls(text: String, grammars: Seq[Grammar]): Vector[Citation] =
    scan(text, urlGrammar +: grammars).map { c =>
      if (c.grammar == "URLRef") c.copy(candidateUri = c.matchText) else c
    }

  /** RFC citation grammars (rfc.py:430-452): "section X of RFC n",
    * "section X", "[RFC nnnn]" / "RFC nnnn". Section-only citations format
    * to a doc-relative "#S<sec>" fragment; the caller resolves them against
    * the document URI. */
  def rfcGrammars(canonicalUri: String => String): Seq[Grammar] = {
    def secPart(caps: Map[String, String]): String =
      caps.get("sec").map(s => "#S" + s.replaceAll("\\.+$", "")).getOrElse("")
    def rfcPart(caps: Map[String, String]): String =
      caps.get("rfc").map(n => canonicalUri(n.replaceFirst("^0+", ""))).getOrElse("")
    Seq(
      Grammar("SecRFCRef",
        """(?i)\bsection (?<sec>\d[\d.]*) of \[?RFC ?(?<rfc>\d+)\]?""".r,
        Seq("sec", "rfc"), c => rfcPart(c) + secPart(c)),
      Grammar("SecRef",
        """(?i)\bsection (?<sec>\d[\d.]*)""".r,
        Seq("sec"), c => secPart(c)),
      Grammar("RFCRef",
        """\[?RFC ?(?<rfc>\d+)\]?""".r,
        Seq("rfc"), c => rfcPart(c)))
  }
}
