package graft

import graft.model.{Triple, Vocab}

/** Test-only mini Turtle reader (extracted from RdfaSpec so the Turtle
  * WRITER round-trip can reuse it): the subset rdflib emits in the
  * reference fixtures and graft's own `kg_ttl_export` emits — @prefix,
  * `a`, <uri>, curies, "literal"(@lang|^^dt)?, ';'/','/'.'. A full
  * Turtle codec stays out of scope; NT is the supported interchange. */
object TtlTestReader {

  def parse(text: String): Set[Triple] = {
    val pfx = scala.collection.mutable.HashMap.empty[String, String]
    val out = scala.collection.mutable.HashSet.empty[Triple]
    var i = 0
    val s = text
    def ws(): Unit = {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == '#')) {
        if (s.charAt(i) == '#') while (i < s.length && s.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    def token(): String = {
      ws()
      if (s.charAt(i) == '<') {
        val e = s.indexOf('>', i); val t = s.substring(i, e + 1); i = e + 1; t
      } else if (s.charAt(i) == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (s.charAt(i) != '"') {
          if (s.charAt(i) == '\\') { sb.append(unesc(s.charAt(i + 1))); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        i += 1
        sb.append('"')
        // @lang or ^^dt suffix
        if (i < s.length && s.charAt(i) == '@') {
          val st = i; while (i < s.length && !s.charAt(i).isWhitespace &&
            s.charAt(i) != ';' && s.charAt(i) != ',' && s.charAt(i) != '.') i += 1
          sb.append(s.substring(st, i))
        } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
          val st = i; i += 2
          while (i < s.length && !s.charAt(i).isWhitespace &&
            s.charAt(i) != ';' && s.charAt(i) != ',') i += 1
          sb.append(s.substring(st, i))
        }
        sb.toString
      } else {
        val st = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          s.charAt(i) != ';' && s.charAt(i) != ',') i += 1
        var t = s.substring(st, i)
        // a bare curie ends a statement as "pfx:local ." — strip the dot
        if (t.length > 1 && t.endsWith(".") && !t.contains(":")) { t = t.dropRight(1); i -= 1 }
        t
      }
    }
    // Turtle string escapes — \n/\r/\t restore their control chars;
    // \" and \\ drop the backslash (what the old reader did for all)
    def unesc(c: Char): Char = c match {
      case 'n' => '\n'
      case 'r' => '\r'
      case 't' => '\t'
      case other => other
    }
    def expand(t: String): String =
      if (t.startsWith("<")) t.substring(1, t.length - 1)
      else if (t == "a") Vocab.RDF_TYPE
      else { val Array(p, l) = t.split(":", 2); pfx(p) + l }
    def obj(t: String, subj: String, pred: String): Triple =
      if (t.startsWith("\"")) {
        val close = t.lastIndexOf('"')
        val lex = t.substring(1, close)
        val suffix = t.substring(close + 1)
        if (suffix.startsWith("@"))
          Triple.lit(subj, pred, lex, "", lang = Some(suffix.substring(1)))
        else if (suffix.startsWith("^^"))
          Triple.lit(subj, pred, lex, "", datatype = Some(expand(suffix.substring(2))))
        else Triple.lit(subj, pred, lex, "")
      } else Triple.uri(subj, pred, expand(t), "")

    ws()
    while (i < s.length) {
      val t0 = token()
      if (t0 == "@prefix") {
        val p = token().stripSuffix(":")
        val ns = token()
        pfx(p) = ns.substring(1, ns.length - 1)
        token() // '.'
      } else if (t0.nonEmpty) {
        val subj = expand(t0)
        var pred = expand(token())
        var done = false
        while (!done) {
          out += obj(token(), subj, pred)
          ws()
          s.charAt(i) match {
            case ',' => i += 1
            case ';' =>
              i += 1; ws()
              if (s.charAt(i) == '.') { i += 1; done = true }
              else pred = expand(token())
            case '.' => i += 1; done = true
            case _ => done = true
          }
        }
      }
      ws()
    }
    out.toSet
  }
}
