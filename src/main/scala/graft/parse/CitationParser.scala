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
    * groups to a candidate URI (possibly doc-relative, starting with "#").
    * `prefilter` is an optional cheap necessary condition implied by the
    * pattern (a literal substring the regex cannot match without): when it
    * returns false the regex engine is never invoked for the span. Purely
    * an evaluation shortcut — it must never change which spans match. */
  final case class Grammar(
      name: String,
      pattern: Regex,
      groups: Seq[String],
      format: Map[String, String] => String,
      prefilter: String => Boolean = _ => true)

  /** Case-insensitive substring probe (needle must be lowercase ASCII) —
    * allocation-free, used by grammar prefilters. */
  def containsIgnoreCase(hay: String, needle: String): Boolean = {
    val n = hay.length - needle.length
    var i = 0
    while (i <= n) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return true
      i += 1
    }
    false
  }

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
    for (g <- grammars; if g.prefilter(text)) {
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
    Seq.empty, _ => "", // candidate URI = matched text; handled in scanUrl
    prefilter = _.contains("://"))

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
        Seq("sec", "rfc"), c => rfcPart(c) + secPart(c),
        prefilter = t => containsIgnoreCase(t, "section ") &&
          containsIgnoreCase(t, "rfc")),
      Grammar("SecRef",
        """(?i)\bsection (?<sec>\d[\d.]*)""".r,
        Seq("sec"), c => secPart(c),
        prefilter = containsIgnoreCase(_, "section ")),
      Grammar("RFCRef",
        """\[?RFC ?(?<rfc>\d+)\]?""".r,
        Seq("rfc"), c => rfcPart(c),
        prefilter = _.contains("RFC")))
  }

  // --------------------------------------------------------------- eulaw
  /** CELEX number for an EU legal act (public CELEX scheme: sector 3 =
    * legislation, 4-digit year, L=directive / R=regulation, number padded
    * to 4): directive 1995/46 → "31995L0046". Two-digit years expand per
    * the EEC epoch (1958): yy >= 58 → 19yy, else 20yy. */
  def celexNum(year: String, ord: String, acttype: String): String = {
    val y4 =
      if (year.length == 4) year.toInt
      else if (year.toInt >= 58) 1900 + year.toInt
      else 2000 + year.toInt
    val letter = if (acttype == "direktiv") "L" else "R"
    f"3$y4%04d$letter${ord.toInt}%04d"
  }

  /** EU-law citation grammars — port of the reference's stock eulaw
    * grammar (citationpatterns.py:40-70: Swedish-language references like
    * "rådets direktiv 95/46/EG av den 24 oktober 1995", "artikel 42.1 i
    * kommissionens förordning (EG) nr 1234/2006 av den ...", bare
    * "artikel 42.1"), tried most-specific-first exactly like the
    * reference's MatchFirst([ArticleLegalact, Legalact, Article]).
    *
    * URI formatting: the reference's uriformats.eulaw documents a
    * "CELEX-based URI" but raises NotImplementedError
    * (uriformats.py:47-57); we implement that documented intent —
    * acts mint into the corpus URI space via the COIN celex template,
    * articles-in-acts append an "#A<n>[.<m>]" fragment, and bare
    * articles format doc-relative (resolved by the caller like section
    * refs). */
  def eulawGrammars(celexUri: String => String): Seq[Grammar] = {
    val inst = "(?:rådets|Europaparlamentets och rådets|kommissionens)"
    val month = "(?:januari|februari|mars|april|maj|juni|juli|augusti" +
      "|september|oktober|november|december)"
    val dirPat = """(?<dyear>\d{4}|\d{2})/(?<dord>\d+)/(?:EEG|EG)"""
    val regPat = """\((?:EEG|EG)\) nr (?<rord>\d+)/(?<ryear>\d{4}|\d{2})"""
    val date = s"""av den \\d{1,2} $month \\d{4}"""
    val act =
      s"""$inst (?<acttype>direktiv|förordning) (?:$dirPat|$regPat) $date"""
    val article = """artikel (?<art>\d+)(?:\.(?<subart>\d+))?"""
    def actUri(c: Map[String, String]): String = {
      val year = c.getOrElse("dyear", c.getOrElse("ryear", ""))
      val ord = c.getOrElse("dord", c.getOrElse("rord", ""))
      celexUri(celexNum(year, ord, c("acttype")))
    }
    def artFrag(c: Map[String, String]): String =
      "#A" + c("art") + c.get("subart").map("." + _).getOrElse("")
    // literal substrings each pattern cannot match without (evaluation
    // shortcut only): both article grammars require "artikel ", both act
    // grammars the literal "av den " of the date clause
    val hasArtikel = (t: String) => t.contains("artikel ")
    val hasActDate = (t: String) => t.contains("av den ")
    Seq(
      Grammar("EULawArticleAct", s"""\\b$article i $act""".r,
        Seq("art", "subart", "acttype", "dyear", "dord", "ryear", "rord"),
        c => actUri(c) + artFrag(c),
        prefilter = t => hasArtikel(t) && hasActDate(t)),
      Grammar("EULawAct", s"""\\b$act""".r,
        Seq("acttype", "dyear", "dord", "ryear", "rord"), actUri,
        prefilter = hasActDate),
      Grammar("EULawArticle", s"""\\b$article""".r,
        Seq("art", "subart"), artFrag,
        prefilter = hasArtikel))
  }
}
