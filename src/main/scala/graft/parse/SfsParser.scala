package graft.parse

import java.util.regex.Pattern

/** Swedish statute STRUCTURE parser — the forfattningstext slice of the
  * reference's SFS repository
  * (/root/reference/ferenda/sources/legal/se/sfs_parser.py): consolidated
  * statute text → a Forfattning element tree of Kapitel ("N kap."),
  * Paragraf ("N §"), Stycke, Rubrik (headlines, with the
  * headline/underrubrik level state machine) and the three list forms
  * (NumreradLista / Bokstavslista / Strecksatslista), so sections become
  * addressable sub-resources (#K..P.. fragments) exactly like rfc #S
  * fragments.
  *
  * Faithfully kept semantics (all line-cited to sfs_parser.py):
  *  - guess_state dispatch ORDER (sfs_parser.py:519-557): blank, kapitel,
  *    paragraf, numrerad/strecksats/bokstavs-lista, rubrik, stycke;
  *  - idOfKapitel (sfs_parser.py:675-731): the "N kap."/"N a kap." id with
  *    the false-positive line-ending filters (",", ";", " och", " om",
  *    " samt", "." unless the whole chunk is the id or it ends with
  *    m.m./m.fl., and the trailing-§ cross-reference guard);
  *  - isKapitel (sfs_parser.py:641-673): ordinal must compare >= the
  *    current chapter (numcmp), with the fake_chapter TOC guard for a
  *    first chapter whose single 1 § holds a table of contents;
  *  - isParagraf/idOfParagraf (sfs_parser.py:836-892): "N §"/"N a §" id
  *    (and the archaic "§ N." form), ordinal >= current section, and the
  *    lowercase-after-id guard that filters mid-sentence references;
  *  - isRubrik (sfs_parser.py:732-830): starts uppercase, <= 135 chars,
  *    not paragraph/list-shaped, no sentence-final punctuation (with the
  *    m.m./m.fl. exceptions), no change-note, and must be FOLLOWED by a
  *    paragraf or another rubrik; a rubrik followed by a rubrik raises the
  *    headline level so the follower becomes type=underrubrik
  *    (sfs_parser.py:224-228);
  *  - makeKapitel/makeParagraf/makeStycke loop shapes and their
  *    state updates (sfs_parser.py:176-333), including the strict "only a
  *    stycke can continue a paragraf" invariant (the reference's assert,
  *    sfs_parser.py:303-305);
  *  - lists attach to the enclosing Stycke, sublists to the last
  *    Listelement (sfs_parser.py:313-409); list ordinals lose their
  *    separator (idOfNumreradLista, sfs_parser.py:1205-1222).
  *
  * Also kept: övergångsbestämmelser (transitional provisions) and
  * bilagor (appendices) — the document TAIL structure
  * (sfs_parser.py:417-487, 1240-1276): the three separator headings
  * (with the headline-not-separator guard: a separator followed by a
  * regular paragraf is an ordinary rubrik), per-amendment
  * Overgangsbestammelse blocks keyed by a bare `NNNN:NNN` SFS-id line,
  * initial un-keyed provisions wrapped with an assumed sfsnr, the
  * rubrik_saknas top-level wrap (sfs_parser.py:102-107), and Bilaga
  * blocks bounded by the next bilaga/övergångsbestämmelser.
  *
  * Also kept: Avdelning divisions (all six heading-id styles,
  * sfs_parser.py:558-640 — swedish ordinal word, AVD./AVDELNING with
  * roman or single-letter ordinals, Avd. N, N avd.; the
  * greater-than-current and not-in-chapter-1 guards; optional
  * underrubrik) and the revoked-element stubs UpphavtKapitel /
  * UpphavdParagraf (sfs_parser.py:33-36, 173-180, 234-241 — one-line
  * "har upphävts genom lag (…)" markers, the section form also
  * advancing current_section).
  *
  * Also kept: the /Upphör…/-/Träder i kraft…/ temporal annotations
  * (andringsDatum, sfs_parser.py:24-44, 488-517): upphor/ikrafttrader
  * attributes on Forfattning/Kapitel/Rubrik/Paragraf/Bilaga in the
  * reference's serialized value forms, the rubrik-level-raise gate for
  * marked headlines, and the re-enacted 1 kap. 1 § fake-chapter reset.
  *
  * Also kept: tabeller (sfs_parser.py:894-1199) — the column-inference
  * table parser: isTabell's paragraph-shape heuristics (all-short-lines /
  * all-column-split / short-or-split, with the paragraf/rubrik/tail
  * exceptions and the snedformatterad-row prefix cut), makeTabellrad's
  * tabstop state machine (two-space cell boundaries, the seven-char
  * tabstop tolerance with ghost-column advance, singlelinemode for
  * row-per-line tables, the empty-left-cell carry), dehyphenation
  * (re_dehyphenate, sfs_parser.py:47 — "- " joined except before
  * och/eller), and makeTabell's autostrip-off reading plus the
  * /Upphör…/-/Träder i kraft…/ per-row temporal attribution counter.
  *
  * Underavdelning sub-divisions are kept too, including the reference's
  * own gate: only statutes 1942:740 and 2010:110 use the element
  * (sfs_parser.py:572-581), so the recognizer fires only under those
  * basefiles — everywhere else a roman-numeral heading stays a Rubrik,
  * exactly as in the reference.
  *
  * Pure per-row logic: one [[parse]] call per document inside a Dataset
  * map stage — no Spark types, no shared state.
  */
object SfsParser {

  // ---- regexes (sfs_parser.py:13-41; \xa7 == '§')
  private val ChapterId = Pattern.compile("^(\\d+( \\w|))\\s[Kk][Aa][Pp]\\.")
  private val SectionId = Pattern.compile("^(\\d+ ?\\w?) §[ .]")
  private val SectionIdOld = Pattern.compile("^§ (\\d+ ?\\w?).")
  private val DottedNumber = Pattern.compile("^(\\d+ ?\\w?)\\. ")
  private val NumberRightPara = Pattern.compile("^(\\d+)\\) ")
  private val Bokstavslista = Pattern.compile("^(\\w)\\) ")
  private val Strecksatslista = Pattern.compile("^(- | |– |--)")
  private val ChangeNote = Pattern.compile("(Lag|Förordning) \\(\\d{4}:\\d+\\)\\.?$")
  private val SimpleSfsId = Pattern.compile("^(\\d{4}:\\d+)\\s*$")
  // re_dehyphenate (sfs_parser.py:47): join "xxx- yyy" unless the
  // continuation is och/eller; UNICODE_CHARACTER_CLASS so \b treats
  // å/ä/ö as word chars like python re.UNICODE
  private val Dehyphenate = Pattern.compile("\\b- (?!(och|eller))",
    Pattern.UNICODE_CHARACTER_CLASS)
  private val ChapterRevoked = Pattern.compile(
    "^(\\d+( \\w|)) [Kk]ap\\. (upphävd|[Hh]ar upphävts) genom " +
    "(förordning|lag) \\([\\d:. s]+\\)\\.?$")
  private val SectionRevoked = Pattern.compile(
    "^(\\d+ ?\\w?) §[ .]([Hh]ar upphävts|[Nn]y beteckning (\\d+ ?\\w?) §) " +
    "genom ([Ff]örordning|[Ll]ag) \\([\\d:. s]+\\)\\.$")
  // /Upphör att gälla U:…/ and /Träder i kraft I:…/ temporal markers
  // (sfs_parser.py:24-44, translated verbatim — including the stray
  // empty alternative in re_EntryIntoForceDate)
  private val RevokeDate = Pattern.compile(
    "/(?:Rubriken u|Kapitlet u|U)pphör att gälla U:(\\d+)-(\\d+)-(\\d+)" +
    "(?: genom lag \\(\\d{4}:\\d+\\).|)/")
  private val RevokeAuth = Pattern.compile(
    "/(?:Kapitlet u|U)pphör att gälla U:(den dag (?:som |)regeringen " +
    "bestämmer)(?: genom lag \\(\\d{4}:\\d+\\).|)/")
  private val ForceDate = Pattern.compile(
    "/(?:Rubriken t||Kapitlet t|T)räder i kraft I:(\\d+)-(\\d+)-(\\d+)" +
    "(?: genom lag \\(\\d{4}:\\d+\\).|)/")
  private val ForceAuth = Pattern.compile(
    "/(?:Kapitlet t|T)räder i kraft I:(den dag (?:som |)regeringen " +
    "bestämmer)(?: genom lag \\(\\d{4}:\\d+\\).|)/")

  /** andringsDatum (sfs_parser.py:488-517): extract the temporal
    * markers from a line/paragraph, returning the stripped text plus
    * the upphor/ikrafttrader values in the reference's SERIALIZED form
    * (python datetime repr for dates, the "den dag regeringen
    * bestämmer" authorization phrase verbatim). An invalid date leaves
    * the line unaffected, as the reference's ValueError branch does. */
  def andringsDatum(line0: String, matchStart: Boolean = false)
      : (String, Option[String], Option[String]) = {
    var line = line0
    var upphor: Option[String] = None
    var ikraft: Option[String] = None
    def extract(re: Pattern, isUpphor: Boolean): Unit = {
      val m = re.matcher(line)
      if (if (matchStart) m.lookingAt() else m.find()) {
        val value =
          if (m.groupCount() == 3) {
            try {
              java.time.LocalDate.of(m.group(1).toInt, m.group(2).toInt,
                m.group(3).toInt)
              Some(s"datetime.datetime(${m.group(1).toInt}, " +
                s"${m.group(2).toInt}, ${m.group(3).toInt}, 0, 0)")
            } catch { case _: RuntimeException => None }
          } else Some(m.group(1))
        value.foreach { v =>
          if (isUpphor) upphor = Some(v) else ikraft = Some(v)
          line = re.matcher(line).replaceAll("")
        }
      }
    }
    extract(RevokeDate, isUpphor = true)
    extract(RevokeAuth, isUpphor = true)
    extract(ForceDate, isUpphor = false)
    extract(ForceAuth, isUpphor = false)
    (line.trim, upphor, ikraft)
  }

  /** util.numcmp over "2 a"-style ordinals: split into digit/non-digit
    * runs, compare pairwise (numbers numerically). */
  def numCmp(a: String, b: String): Int = {
    def toks(s: String): Vector[Either[Long, String]] =
      "\\d+|\\D+".r.findAllIn(s).toVector.map(t =>
        if (t.head.isDigit) Left(t.toLong) else Right(t))
    val (ta, tb) = (toks(a), toks(b))
    ta.zipAll(tb, Right(""), Right("")).foreach {
      case (Left(x), Left(y)) => if (x != y) return x.compare(y)
      case (x, y) =>
        val c = x.fold(_.toString, identity).compareTo(y.fold(_.toString, identity))
        if (c != 0) return c
    }
    0
  }

  private def normalize(s: String): String =
    s.trim.replaceAll("[\\s\\u00a0]+", " ")

  /** Chunk-based reader emulating the reference's TextReader
    * (/root/reference/ferenda/textreader.py:84-226): delimiter-find chunk
    * reads over the RAW text, each returned chunk run through __process —
    * optional whole-chunk strip (the `autostrip` toggle that makeTabell
    * flips OFF so column whitespace survives, sfs_parser.py:1049-1051)
    * followed by expandtabs(8) (textreader.py:61 — expandtabs defaults
    * true). linesep is "\n"; callers normalize CRLF before parsing, which
    * is equivalent to the harness's linesep=DOS (a whitespace-only line
    * is NOT a paragraph boundary in either form). Past-EOF peeks return
    * "" where the reference raises IOError — every reference call site
    * catches that IOError into ''/eof. */
  final class Reader(text: String) {
    val linesep = "\n"
    var autostrip = false
    private val data = text
    private val maxpos = data.length
    private var currpos = 0

    // python str.strip(): unicode whitespace incl. NBSP/NEL
    private def pyStrip(s: String): String = {
      def ws(c: Char) =
        Character.isWhitespace(c) || c == ' ' || c == ''
      var i = 0; var j = s.length
      while (i < j && ws(s(i))) i += 1
      while (j > i && ws(s(j - 1))) j -= 1
      s.substring(i, j)
    }
    // python str.expandtabs(8): column resets after \n and \r
    private def expandTabs(s: String): String =
      if (s.indexOf('\t') < 0) s
      else {
        val sb = new StringBuilder
        var col = 0
        s.foreach {
          case '\t' =>
            val pad = 8 - (col % 8)
            sb.append(" " * pad); col += pad
          case c @ ('\n' | '\r') => sb.append(c); col = 0
          case c => sb.append(c); col += 1
        }
        sb.toString
      }
    private def process(s: String): String =
      expandTabs(if (autostrip) pyStrip(s) else s)

    /** __find (textreader.py:84-92): chunk up to delimiter. */
    private def find(delim: String, start: Int): (String, Int) = {
      val idx = data.indexOf(delim, start)
      if (idx == -1) {
        val res = data.substring(start)
        (res, start + res.length)
      } else (data.substring(start, idx), idx + delim.length)
    }

    def eof: Boolean = currpos == maxpos

    def peek(size: Int): String =
      process(data.substring(currpos, math.min(currpos + size, maxpos)))

    def readchunk(delim: String): String = {
      val (res, np) = find(delim, currpos)
      currpos = np
      process(res)
    }
    def readline(): String = readchunk(linesep)
    /** readparagraph (textreader.py:159-172). Under autostrip the
      * leading/trailing-newline consume loops never fire (peek returns
      * the PROCESSED probe, stripped to "") — exactly as in python. */
    def readparagraph(): String = {
      while (peek(linesep.length) == linesep) currpos += linesep.length
      val res = readchunk(linesep * 2)
      while (peek(linesep.length) == linesep) currpos += linesep.length
      res
    }
    /** peekchunk (textreader.py:216-226); "" stands in for IOError. */
    def peekchunk(delim: String, times: Int): String = {
      var oldpos = currpos
      var res = ""
      var i = 0
      while (i < times) {
        val (r, np) = find(delim, oldpos)
        if (np == oldpos) return ""
        res = r; oldpos = np; i += 1
      }
      process(res)
    }
    def peekline(n: Int = 1): String = peekchunk(linesep, n)
    def peekparagraph(n: Int = 1): String = {
      val startpos = currpos
      while (peek(linesep.length) == linesep) currpos += linesep.length
      val res = peekchunk(linesep * 2, n)
      currpos = startpos
      res
    }
  }

  // ---- parser state (sfs_parser.py's `state` dict)
  private final class St {
    var currentAvdelning = "0"
    var currentChapter = "0"
    var currentSection = "0"
    var fakeChapter = "0"
    var headlineLevel = 0
  }

  /** sfs_parser.py:57-69: "första" → 1 … "tolfte" → 12. */
  private val SwedishOrdinals = Vector("första", "andra", "tredje",
    "fjärde", "femte", "sjätte", "sjunde", "åttonde", "nionde", "tionde",
    "elfte", "tolfte").zipWithIndex.map { case (w, i) => w -> (i + 1) }.toMap

  /** The strict roman-numeral validator the reference uses before
    * from_roman (sfs_parser.py:50-52). */
  private val RomanNumeral = Pattern.compile(
    "^M?M?M?(CM|CD|D?C?C?C?)(XC|XL|L?X?X?X?)(IX|IV|V?I?I?I?)$")

  def parse(text: String): TreeNode = parse(text, None)

  /** `basefile`: the document's own SFS number — the assumed sfsnr for
    * initial un-keyed transitional provisions (sfs_parser.py:437-447
    * falls back to state['basefile']); "0000:000" without one. */
  def parse(text: String, basefile: Option[String]): TreeNode = {
    val reader = new Reader(text)
    reader.autostrip = true // sfs.py:1116 (reader.autostrip = True)
    val st = new St

    // ---- recognizers -----------------------------------------------
    def idOfKapitel(p0: String): Option[String] = {
      val p = andringsDatum(p0.replace("\n", " "))._1 // sfs_parser.py:678
      val m = ChapterId.matcher(p)
      if (!m.find()) return None
      // false-positive filters (sfs_parser.py:686-731)
      val mmEnd = p.endsWith(" m.m.") || p.endsWith(" m. m.") ||
        p.endsWith(" m.fl.") || p.endsWith(" m. fl.")
      if (p.endsWith(",") || p.endsWith(";") || p.endsWith(" och") ||
          p.endsWith(" om") || p.endsWith(" samt") ||
          (p.endsWith(".") && !(m.end() == p.length || mmEnd))) return None
      // "1 kap. 5 §"-style cross references are not chapter headings
      if (p.endsWith(" §") || p.endsWith(" §§") ||
          (p.endsWith(" stycket") && p.contains(" § "))) return None
      Some(m.group(1))
    }

    def isKapitel(p: String): Boolean =
      idOfKapitel(p) match {
        case Some(ord) if numCmp(ord, st.currentChapter) >= 0 =>
          if (st.currentChapter == "1" && st.currentSection == "1") {
            // probably a TOC inside 1 kap. 1 § (sfs_parser.py:650-663)
            if (numCmp(ord, st.fakeChapter) < 0) true
            else { st.fakeChapter = ord; false }
          } else true
        case _ => false
      }

    def idOfParagraf(p: String): Option[String] = {
      val m = SectionId.matcher(p)
      if (m.find()) Some(m.group(1))
      else {
        val mo = SectionIdOld.matcher(p)
        if (mo.find()) Some(mo.group(1)) else None
      }
    }

    def isParagraf(p: String): Boolean =
      idOfParagraf(p) match {
        case None => false
        case Some("1") => true
        case Some(ord) =>
          if (numCmp(ord, st.currentSection) < 0) false
          else {
            // mid-sentence references start lowercase after the id
            // (sfs_parser.py:873-884)
            val idx = ord.length + " § ".length
            !(p.length > idx && p.charAt(idx).isLower)
          }
      }

    def isNumreradLista(p: String): Boolean =
      DottedNumber.matcher(p).find() || NumberRightPara.matcher(p).find()

    def isStrecksatslista(p: String): Boolean =
      Strecksatslista.matcher(p).find()
    def isBokstavslista(p: String): Boolean =
      Bokstavslista.matcher(p).find()

    def isRubrik(p: String, indirect: Boolean): Boolean = {
      // an EMPTY next paragraph passes every check in the reference's
      // indirect recursion (the followed-by test is skipped when
      // indirect), so a document-FINAL headline is a rubrik
      // (sfs_parser.py:743-830 on '' returns True when indirect)
      if (p.isEmpty) return indirect
      // sfs_parser.py:743 — any non-uppercase start rejects, EXCEPT the
      // "/Rubriken upphör…/" temporal-marker prefix (the marker is
      // consumed by makeRubrik's andringsDatum)
      if (p.head.toLower == p.head && !p.startsWith("/Rubriken"))
        return false
      if (p.length > 135) return false
      if (isParagraf(p) || isNumreradLista(p) || isStrecksatslista(p))
        return false
      val mmEnd = p.endsWith("m.m.") || p.endsWith("m. m.") ||
        p.endsWith("m.fl.") || p.endsWith("m. fl.")
      if (p.endsWith(".") && !mmEnd) return false
      if (p.endsWith(",") || p.endsWith(":") || p.endsWith("samt") ||
          p.endsWith("eller")) return false
      if (ChangeNote.matcher(p).find()) return false
      if (p.startsWith("/") && p.endsWith("./")) return false
      if (!indirect) {
        val nextp = normalize(reader.peekparagraph(2))
        if (!isParagraf(nextp) && !isRubrik(nextp, indirect = true))
          return false
        // rubrik followed by rubrik ⇒ followers are sub-headlines —
        // unless THIS rubrik carries a temporal marker
        // (sfs_parser.py:820-828: andringsDatum(p)[0] == p gate)
        if (isRubrik(nextp, indirect = true) && andringsDatum(p)._1 == p)
          st.headlineLevel = 1
      }
      true
    }

    sealed trait Handler
    case object Blank extends Handler
    case object Kap extends Handler
    case object Par extends Handler
    case object NumLista extends Handler
    case object StreckLista extends Handler
    case object BokstavLista extends Handler
    case object Rub extends Handler
    case object StyckeH extends Handler
    case object TabH extends Handler   // tabell (column-split rows)
    case object AvdH extends Handler   // avdelning (division) heading
    case object UndAvdH extends Handler // underavdelning (sub-division)
    case object UKapH extends Handler  // revoked chapter stub line
    case object UParH extends Handler  // revoked/renumbered section stub
    case object ObsH extends Handler   // övergångsbestämmelser separator
    case object ObH extends Handler    // one bestämmelse (bare SFS-id line)
    case object BilagaH extends Handler
    case object Eof extends Handler

    /** idOfAvdelning (sfs_parser.py:586-620): the six styles of
      * division headings in Swedish law ("FÖRSTA AVDELNINGEN",
      * "AVD. I", "AVDELNING I.", "Avdelning I", "1 avd.", "Avd. 1";
      * single letters where they are not valid roman numerals —
      * A/B/E/F/G/H. The reference's C/D letter ordinals need its
      * basefile == 2010:110 gate (sfs_parser.py:622-626), which a
      * basefile-less parse cannot replicate: C and D convert as roman
      * 100/500, the reference's own default for every other statute). */
    def idOfAvdelning(): Option[String] = {
      val p = reader.peekline()
      val parts = p.trim.split("\\s+")
      def roman(r0: String): Option[String] = {
        val r = if (r0.endsWith(".")) r0.dropRight(1) else r0
        if (r.nonEmpty && RomanNumeral.matcher(r).matches())
          Some(graft.functions.Selectors.fromRoman(r).toString)
        else if (Set("A", "B", "C", "D", "E", "F", "G", "H")(r)) Some(r)
        else None
      }
      if (p.toLowerCase.endsWith("avdelningen") && parts.length == 2)
        SwedishOrdinals.get(parts(0).toLowerCase).map(_.toString)
      else if ((p.startsWith("AVD. ") || p.startsWith("AVDELNING ")) &&
               parts.length >= 2)
        roman(parts(1)) // roman OR the 2010:110 single letters
      else if (p.startsWith("Avdelning ") && parts.length >= 2)
        roman(parts(1)).filter(_.forall(_.isDigit)) // roman only here
      else if (p.length >= 6 && p.substring(2, 6) == "avd." && p(0).isDigit)
        Some(p(0).toString)
      else if (p.startsWith("Avd. ") && parts.length >= 2 &&
               parts(1).forall(_.isDigit))
        Some(parts(1))
      else None
    }

    /** isAvdelning (sfs_parser.py:558-571): heading of <= 3 lines with a
      * division ordinal GREATER than the current one; a division while
      * still in chapter 1 is probably a TOC excerpt. */
    def isAvdelning(): Boolean = {
      val p = reader.peekparagraph()
      if (p.count(_ == '\n') > 2) false
      else idOfAvdelning() match {
        case Some(ord) => numCmp(ord, st.currentAvdelning) > 0 &&
          st.currentChapter != "1"
        case None => false
      }
    }

    /** isUnderavdelning (sfs_parser.py:572-581): gated to the only two
      * statutes that use the element (1942:740, 2010:110); a heading of
      * at most two lines opening with a roman numeral (optionally
      * dotted) and an uppercase word, not ending like a sentence. */
    val UnderavdelningHead = Pattern.compile("^[IVX]+\\.? +[A-ZÅÄÖ]")
    def isUnderavdelning(p0: Option[String] = None): Boolean = {
      if (!basefile.exists(Set("1942:740", "2010:110"))) return false
      val p = p0.getOrElse(reader.peekparagraph())
      p.count(_ == '\n') < 2 && UnderavdelningHead.matcher(p).find() &&
        (!p.endsWith(".") || p.endsWith("m.m."))
    }

    /** isOvergangsbestammelser (sfs_parser.py:1240-1263): one of the
      * three separator headings; a separator followed by a regular
      * paragraf is an ordinary headline, not the tail separator. (The
      * reference's difflib 0.9 fuzzy heading match is skipped — it only
      * warns on typos in real gazette text.) */
    val obSeparators = Seq("Övergångsbestämmelser",
      "Ikraftträdande- och övergångsbestämmelser",
      "Övergångs- och ikraftträdandebestämmelser")
    // difflib.get_close_matches(l, separators, 1, 0.9): a misspelled
    // heading within ratio 0.9 still separates (2*LCS/(m+n) stands in
    // for SequenceMatcher.ratio — same decisions at this cutoff)
    def lcsRatio(a: String, b: String): Double = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      2.0 * dp(a.length)(b.length) / (a.length + b.length)
    }
    def isObs(line: String): Boolean = {
      val l = line.trim
      (obSeparators.contains(l) ||
        obSeparators.exists(sep => lcsRatio(l, sep) >= 0.9)) &&
        !isParagraf(normalize(reader.peekparagraph(2)))
    }

    /** isBilaga (sfs_parser.py:1268-1276), minus the andringsDatum strip
      * (temporal markers scoped out). */
    def isBilaga(line: String): Boolean = {
      val l = andringsDatum(line)._1
        .replace(" /Bilagan är inte med här/", "").trim
      Set("Bilaga", "Bilaga*", "Bilaga *", "Bilaga 1", "Bilaga 2",
        "Bilaga 2 a", "Bilaga 3", "Bilaga 4", "Bilaga 5",
        "Bilaga 6")(l)
    }

    /** isTabell (sfs_parser.py:894-1040): does this paragraph look like
      * table row(s)? Exact port, including the snedformatterad prefix
      * cut (only the lines before an indented→unindented transition are
      * judged), the three acceptance rules (all lines short / all lines
      * column-split / all short-or-split), the all-short exceptions
      * (looks like a paragraf; first-row-left-cell-only must be followed
      * by a genuinely column-split row; single-line rows backing off to
      * a following paragraf, rubrik+paragraf, or the document tail), and
      * the leaked-loop-variable single-line three-space check at the
      * end (the reference's `'   ' in l` reads the LAST line of the raw
      * split, not lines[0] — kept verbatim). */
    def isTabell(p: String, assumeTable: Boolean,
                 requireColumns: Boolean): Boolean = {
      val shortline = 55
      val shorterline = 52
      val allLines = p.split(reader.linesep, -1)
      val lines = Vector.newBuilder[String]
      var emptyleft = false
      var leakedL = ""
      var broke = false
      val it = allLines.iterator
      while (it.hasNext && !broke) {
        val l = it.next()
        leakedL = l
        if (l.startsWith(" ")) { emptyleft = true; lines += l }
        else if (emptyleft) broke = true
        else lines += l
      }
      val ls = lines.result()
      val numlines = ls.length
      if ((assumeTable || numlines > 1) && !requireColumns) {
        if (numlines == 1 && ls(0).contains("  ")) return true
        if (ls.count(_.length < shortline) == numlines) {
          // exception: no column split and looks like a new paragraf
          if (!ls(0).contains("  ") && isParagraf(p)) return false
          val p2 = reader.peekparagraph(2)
          val p3 = reader.peekparagraph(3)
          if (!assumeTable &&
              !isTabell(p2, assumeTable = true, requireColumns = true))
            return false
          else if (numlines == 1) {
            if (isParagraf(p2)) return false
            if (isRubrik(p2, indirect = true) && isParagraf(p3)) return false
            if (isObs(reader.peekline())) return false
            if (isBilaga(reader.peekline())) return false
          }
          return true
        }
      }
      if (numlines > 1 && ls.count(_.contains("  ")) == numlines) return true
      if ((assumeTable || numlines > 1) && !requireColumns &&
          ls.count(l => l.contains("  ") || l.length < shorterline) == numlines)
        return true
      if (numlines == 1 && leakedL.contains("   ")) return true
      false
    }

    /** guess_state (sfs_parser.py:519-557), in the reference's order. */
    def guess(): Handler = {
      if (reader.eof) Eof
      else if (reader.peekline().trim.isEmpty) Blank
      else {
        val para = normalize(reader.peekparagraph())
        val line = reader.peekline()
        if (isAvdelning()) AvdH
        else if (isUnderavdelning()) UndAvdH
        // revoked stubs outrank the live recognizers
        // (guess_state order, sfs_parser.py:526-533)
        else if (ChapterRevoked.matcher(line).matches()) UKapH
        else if (SectionRevoked.matcher(line).matches()) UParH
        else if (isKapitel(para)) Kap
        else if (isParagraf(para)) Par
        // tabell outranks the tail separators and every list form
        // (guess_state, sfs_parser.py:536-537)
        else if (isTabell(reader.peekparagraph(), assumeTable = false,
                          requireColumns = false)) TabH
        else if (isObs(line)) ObsH
        else if (SimpleSfsId.matcher(line).find()) ObH
        else if (isBilaga(line)) BilagaH
        else if (isNumreradLista(line)) NumLista
        else if (isStrecksatslista(line)) StreckLista
        else if (isBokstavslista(line)) BokstavLista
        else if (isRubrik(para, indirect = false)) Rub
        else StyckeH
      }
    }

    // ---- constructors ----------------------------------------------
    def makeListelement(idPat: Pattern, ordinal: String): TreeNode = {
      val raw = reader.readparagraph()
      val body = idPat.matcher(normalize(raw)).replaceFirst("")
      TreeNode("Listelement", Vector("ordinal" -> ordinal)).appendText(body)
    }

    def makeNumreradLista(): TreeNode = {
      var n = TreeNode("NumreradLista")
      var go = true
      while (go && !reader.eof) {
        val h = if (isNumreradLista(reader.peekline())) NumLista else guess()
        h match {
          case Blank => reader.readline()
          case NumLista =>
            val line = reader.peekline()
            val m = DottedNumber.matcher(line)
            val (ord, pat) =
              if (m.find()) (m.group(1).replace(" ", ""), DottedNumber)
              else {
                val m2 = NumberRightPara.matcher(line)
                m2.find(); (m2.group(1), NumberRightPara)
              }
            n = n.appendChild(makeListelement(pat, ord))
          case (BokstavLista | StreckLista) if n.children.nonEmpty =>
            // sublist attaches to the LAST listelement (sfs_parser.py:363-365)
            val sub =
              if (h == BokstavLista) makeBokstavslista() else makeStrecksatslista()
            val kids = n.children
            n = n.copy(children =
              kids.init :+ kids.last.appendChild(sub))
          case _ => go = false
        }
      }
      n
    }

    def makeBokstavslista(): TreeNode = {
      var n = TreeNode("Bokstavslista")
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case BokstavLista =>
            val m = Bokstavslista.matcher(reader.peekline())
            m.find()
            n = n.appendChild(makeListelement(Bokstavslista, m.group(1)))
          case _ => go = false
        }
      }
      n
    }

    def makeStrecksatslista(): TreeNode = {
      var n = TreeNode("Strecksatslista")
      var cnt = 0
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case StreckLista =>
            cnt += 1
            n = n.appendChild(makeListelement(Strecksatslista, cnt.toString))
          case _ => go = false
        }
      }
      n
    }

    /** makeTabellcell (sfs_parser.py:1087-1090): dehyphenate (unless the
      * text is a single char) and normalize. An empty cell carries no
      * <str> child (the reference's empty-string child serializes to
      * nothing). */
    def makeTabellcell(text0: String): TreeNode = {
      val text =
        if (text0.length > 1) Dehyphenate.matcher(text0).replaceAll("")
        else text0
      val t = normalize(text)
      if (t.isEmpty) TreeNode("Tabellcell")
      else TreeNode("Tabellcell").appendText(t)
    }

    /** python slice semantics: clamped, empty when end <= start. */
    def pySlice(s: String, a: Int, b: Int): String = {
      val hi = math.max(0, math.min(b, s.length))
      val lo = math.max(0, math.min(a, s.length))
      if (hi <= lo) "" else s.substring(lo, hi)
    }

    /** makeTabellrad (sfs_parser.py:1083-1199): split one raw (autostrip
      * OFF) paragraph into table rows and cells. Cell boundaries are runs
      * of 2+ spaces; tabstops learned from the first row persist across
      * the table (statictabstops), with a seven-char tolerance before a
      * short left cell is pushed into the NEXT column (the tomma-
      * vansterceller case); singlelinemode (every line starts upper/digit)
      * makes each physical line its own row; an indented→unindented
      * transition starts a new row (snedformatterade tabellrader). The
      * growth quirks of the original (tabstops/cols extended ONE slot
      * whenever len(tabstops) <= charcount) are kept verbatim — they are
      * load-bearing for column counts on wide rows. */
    def makeTabellrad(p: String,
                      tabstops0: Option[scala.collection.mutable.ArrayBuffer[Int]],
                      kwargs: Vector[(String, String)])
        : (Vector[TreeNode], scala.collection.mutable.ArrayBuffer[Int]) = {
      import scala.collection.mutable.ArrayBuffer
      var cols = ArrayBuffer.fill(8)("")
      val statictabstops = tabstops0.isDefined
      val tabstops = tabstops0.getOrElse(ArrayBuffer.fill(8)(0))
      val lines = p.split(reader.linesep, -1)
      val numlines = lines.count(_.nonEmpty)
      val potentialrows =
        lines.count(x => x.nonEmpty && (x(0).isUpper || x(0).isDigit))
      var linecount = 0
      val singlelinemode = numlines > 1 && numlines == potentialrows

      val rows = ArrayBuffer[ArrayBuffer[String]]()
      var emptyleft = false
      for (l <- lines if l.nonEmpty) {
        linecount += 1
        var charcount = 0
        var spacecount = 0
        var lasttab = 0
        var colcount = 0
        if (singlelinemode) cols = ArrayBuffer.fill(8)("")
        if (l(0) == ' ') emptyleft = true
        else if (emptyleft) {
          // new row because of skewed formatting (sfs_parser.py:1125-1129)
          rows += cols
          cols = ArrayBuffer.fill(8)("")
          emptyleft = false
        }
        for (c <- l) {
          charcount += 1
          if (c == ' ') spacecount += 1
          else {
            if (spacecount > 1) { // new cell — flush the previous one
              cols(colcount) += "\n" + pySlice(l, lasttab,
                charcount - (spacecount + 1))
              lasttab = charcount - 1
              // empty-left-cell handling: a boundary more than seven
              // chars past the learned tabstop belongs to a later column
              if (linecount > 1 || statictabstops) {
                if (tabstops(colcount + 1) + 7 < charcount) {
                  if (tabstops.length <= colcount + 2) {
                    tabstops += 0; cols += ""
                  }
                  if (tabstops(colcount + 2) != 0) colcount += 1
                }
              }
              colcount += 1
              if (tabstops.length <= charcount) { tabstops += 0; cols += "" }
              tabstops(colcount) = charcount
            }
            spacecount = 0
          }
        }
        cols(colcount) += "\n" + pySlice(l, lasttab, charcount)
        if (singlelinemode) rows += cols
      }
      if (!singlelinemode) rows += cols

      val res = rows.toVector.map { r =>
        var tr = TreeNode("Tabellrad", kwargs)
        var emptyok = true
        for (c <- r) {
          if (c.nonEmpty || emptyok) {
            tr = tr.appendChild(makeTabellcell(c.replace("\n", " ")))
            if (normalize(c).nonEmpty) emptyok = false
          }
        }
        tr
      }
      (res, tabstops)
    }

    /** makeTabell (sfs_parser.py:1042-1081): read consecutive table-row
      * paragraphs with autostrip OFF (so column whitespace survives),
      * threading the learned tabstops through every row; /Upphör…/ and
      * /Träder i kraft…/ marker lines attribute the following rows via
      * the pcnt sign counter, exactly as in the original. */
    def makeTabell(): TreeNode = {
      var pcnt = 0
      var t = TreeNode("Tabell")
      val savedAutostrip = reader.autostrip
      reader.autostrip = false
      val first = reader.readparagraph()
      var (trs, tabstops) = makeTabellrad(first, None, Vector.empty)
      trs.foreach(r => t = t.appendChild(r))
      var currentUpphor: Option[String] = None
      var currentIkraft: Option[String] = None
      var go = true
      while (go && !reader.eof) {
        val (_, upphor, ikraft) =
          andringsDatum(reader.peekline(), matchStart = true)
        if (upphor.isDefined) {
          currentUpphor = upphor
          reader.readline()
          pcnt = 1
        } else if (ikraft.isDefined) {
          currentIkraft = ikraft
          currentUpphor = None
          reader.readline()
          pcnt = -pcnt + 1
        } else if (isTabell(reader.peekparagraph(), assumeTable = true,
                            requireColumns = false)) {
          var kwargs = Vector.empty[(String, String)]
          if (pcnt > 0) {
            kwargs ++= currentUpphor.map("upphor" -> _)
            pcnt += 1
          } else if (pcnt < 0) {
            kwargs ++= currentIkraft.map("ikrafttrader" -> _)
            pcnt += 1
          } else currentIkraft = None
          val p = reader.readparagraph()
          if (p.nonEmpty) {
            val (trs2, ts2) = makeTabellrad(p, Some(tabstops), kwargs)
            tabstops = ts2
            trs2.foreach(r => t = t.appendChild(r))
          }
        } else go = false
      }
      reader.autostrip = savedAutostrip
      t
    }

    def makeStycke(initial: Option[String]): TreeNode = {
      var s = TreeNode("Stycke")
        .appendText(initial.getOrElse(normalize(reader.readparagraph())))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case NumLista => s = s.appendChild(makeNumreradLista())
          case BokstavLista => s = s.appendChild(makeBokstavslista())
          case StreckLista => s = s.appendChild(makeStrecksatslista())
          // tables attach inside the stycke (sfs_parser.py:317-325)
          case TabH => s = s.appendChild(makeTabell())
          case _ => go = false
        }
      }
      s
    }

    def makeParagraf(): TreeNode = {
      val para = normalize(reader.peekparagraph())
      val ordinal = idOfParagraf(para).get
      st.currentSection = ordinal
      // read past the section id (sfs_parser.py:246-248)
      val raw = reader.readparagraph()
      val stripped = {
        val n0 = normalize(raw)
        val m = SectionId.matcher(n0)
        if (m.find()) n0.substring(m.end()).trim
        else {
          val mo = SectionIdOld.matcher(n0)
          if (mo.find()) n0.substring(mo.end()).trim else n0
        }
      }
      // temporal markers on the opening line (sfs_parser.py:257-272) —
      // simplification vs the reference: extracted from the normalized
      // paragraph rather than strictly the first line (markers only
      // ever open a paragraf in the fixture corpus)
      val (fixed0, upphor, ikraft) = andringsDatum(stripped)
      val fixed = normalize(fixed0)
      if (ikraft.isDefined && ordinal == "1" && st.currentChapter == "1")
        st.fakeChapter = "0" // re-enacted 1 kap. 1 § TOC (sfs_parser.py:266-271)
      var p = TreeNode("Paragraf", Vector("ordinal" -> ordinal) ++
          upphor.map("upphor" -> _) ++ ikraft.map("ikrafttrader" -> _))
        .appendChild(makeStycke(Some(fixed)))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          // ObH also ends a paragraf — the reference warns "Avskiljande
          // rubrik saknas" and closes it (sfs_parser.py:285-305)
          case Par | Kap | AvdH | UndAvdH | UKapH | UParH | Rub | ObsH |
               ObH | BilagaH | Eof =>
            go = false
          case StyckeH => p = p.appendChild(makeStycke(None))
          case other =>
            // the reference asserts only stycke continues a paragraf
            // (sfs_parser.py:303-305)
            throw new IllegalStateException(
              s"unexpected $other inside paragraf $ordinal: " +
              reader.peekline().take(60))
        }
      }
      p
    }

    def makeRubrik(): TreeNode = {
      val (line0, upphor, ikraft) =
        andringsDatum(normalize(reader.readparagraph()))
      val line = normalize(line0)
      val levelAttrs =
        if (st.headlineLevel == 2) Vector("type" -> "underrubrik")
        else {
          if (st.headlineLevel == 1) st.headlineLevel = 2
          Vector.empty[(String, String)]
        }
      val attrs = levelAttrs ++
        upphor.map("upphor" -> _) ++ ikraft.map("ikrafttrader" -> _)
      TreeNode("Rubrik", attrs, text = Some(line))
    }

    def makeKapitel(): TreeNode = {
      val para0 = normalize(reader.readparagraph())
      val ordinal = idOfKapitel(para0).get
      val (paraStripped, upphor, ikraft) = andringsDatum(para0)
      val para = normalize(paraStripped) // re-collapse the marker gap
      st.headlineLevel = 0
      st.currentSection = "0"
      st.fakeChapter = "0"
      st.currentChapter = ordinal
      var k = TreeNode("Kapitel",
        Vector("ordinal" -> ordinal, "rubrik" -> para) ++
          upphor.map("upphor" -> _) ++ ikraft.map("ikrafttrader" -> _))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          // divisions, revoked-chapter stubs and the tail separators
          // end a kapitel (sfs_parser.py:198-204)
          case Kap | AvdH | UndAvdH | UKapH | ObsH | BilagaH | Eof =>
            go = false
          case UParH => k = k.appendChild(makeUpphavdParagraf())
          case Par => k = k.appendChild(makeParagraf())
          case Rub => k = k.appendChild(makeRubrik())
          case StyckeH => k = k.appendChild(makeStycke(None))
          case NumLista => k = k.appendChild(makeNumreradLista())
          case BokstavLista => k = k.appendChild(makeBokstavslista())
          case StreckLista => k = k.appendChild(makeStrecksatslista())
          // a bare bestämmelse or a table inside a kapitel takes the
          // generic append branch in the reference (sfs_parser.py:206-209)
          case ObH => k = k.appendChild(makeOvergangsbestammelse())
          case TabH => k = k.appendChild(makeTabell())
        }
      }
      k
    }

    /** makeUpphavtKapitel / makeUpphavdParagraf (sfs_parser.py:173-180,
      * 234-241): one-line stubs marking a revoked chapter, or a revoked/
      * renumbered section (which still advances current_section so the
      * following live sections keep their ordinal ordering). */
    def makeUpphavtKapitel(): TreeNode = {
      val line = reader.readline()
      val m = ChapterRevoked.matcher(line)
      require(m.matches())
      TreeNode("UpphavtKapitel", Vector("ordinal" -> m.group(1)),
        text = Some(line))
    }
    def makeUpphavdParagraf(): TreeNode = {
      val line = reader.readline()
      val m = SectionRevoked.matcher(line)
      require(m.matches())
      st.currentSection = m.group(1)
      TreeNode("UpphavdParagraf", Vector("ordinal" -> m.group(1)),
        text = Some(line))
    }

    /** makeAvdelning (sfs_parser.py:621-640): heading line (+ optional
      * single-line underrubrik when the next-but-one line is isolated by
      * blanks and is not itself a chapter); collects chapters and
      * content until the next division or tail element. Underavdelning
      * is scoped out — the reference itself gates it to exactly two
      * statutes (sfs_parser.py:573-581). */
    def makeAvdelning(): TreeNode = {
      val ordinal = idOfAvdelning().get
      st.currentAvdelning = ordinal
      val rubrik = reader.readline()
      var attrs = Vector("ordinal" -> ordinal, "rubrik" -> rubrik)
      if (reader.peekline(1).trim.isEmpty && reader.peekline(3).trim.isEmpty &&
          !isKapitel(normalize(reader.peekline(2))) &&
          !isUnderavdelning(Some(reader.peekline(2)))) {
        reader.readline() // the blank
        attrs :+= ("underrubrik" -> reader.readline())
      }
      var av = TreeNode("Avdelning", attrs)
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case AvdH | ObsH | BilagaH | Eof => go = false
          // a sub-division nests INSIDE its division — the reference's
          // makeAvdelning loop appends it generically (sfs_parser.py:139)
          case UndAvdH => av = av.appendChild(makeUnderavdelning())
          case Kap => av = av.appendChild(makeKapitel())
          case Par => av = av.appendChild(makeParagraf())
          case Rub => av = av.appendChild(makeRubrik())
          case NumLista => av = av.appendChild(makeNumreradLista())
          case BokstavLista => av = av.appendChild(makeBokstavslista())
          case StreckLista => av = av.appendChild(makeStrecksatslista())
          case StyckeH => av = av.appendChild(makeStycke(None))
          case ObH => av = av.appendChild(makeOvergangsbestammelse())
          case TabH => av = av.appendChild(makeTabell())
          case UKapH => av = av.appendChild(makeUpphavtKapitel())
          case UParH => av = av.appendChild(makeUpphavdParagraf())
        }
      }
      av
    }

    /** makeUnderavdelning (sfs_parser.py:145-167): "II. Rubrik…" — the
      * token before the first space is the ordinal (trailing dot
      * stripped), the rest the rubrik; collects structure until the
      * next sub-division, division or tail element. */
    def makeUnderavdelning(): TreeNode = {
      val para = reader.readparagraph()
      val sp = para.indexOf(' ')
      val (ord0, rubrik) = (para.substring(0, sp), para.substring(sp + 1))
      val ordinal =
        if (ord0.trim.endsWith(".")) ord0.trim.dropRight(1) else ord0
      var u = TreeNode("Underavdelning",
        Vector("ordinal" -> ordinal, "rubrik" -> rubrik))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case UndAvdH | AvdH | ObsH | BilagaH | Eof => go = false
          case Kap => u = u.appendChild(makeKapitel())
          case Par => u = u.appendChild(makeParagraf())
          case Rub => u = u.appendChild(makeRubrik())
          case NumLista => u = u.appendChild(makeNumreradLista())
          case BokstavLista => u = u.appendChild(makeBokstavslista())
          case StreckLista => u = u.appendChild(makeStrecksatslista())
          case StyckeH => u = u.appendChild(makeStycke(None))
          case ObH => u = u.appendChild(makeOvergangsbestammelse())
          case TabH => u = u.appendChild(makeTabell())
          case UKapH => u = u.appendChild(makeUpphavtKapitel())
          case UParH => u = u.appendChild(makeUpphavdParagraf())
        }
      }
      u
    }

    /** makeOvergangsbestammelse (sfs_parser.py:453-466): one amendment's
      * provisions, keyed by its bare SFS-id line; collects structure
      * until the next bestämmelse or bilaga. */
    def makeOvergangsbestammelse(): TreeNode = {
      val m = SimpleSfsId.matcher(reader.readline())
      m.find()
      var ob = TreeNode("Overgangsbestammelse",
        Vector("sfsnr" -> m.group(1)))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case ObH | ObsH | BilagaH | Eof => go = false
          case Kap => ob = ob.appendChild(makeKapitel())
          case Par => ob = ob.appendChild(makeParagraf())
          case Rub => ob = ob.appendChild(makeRubrik())
          case NumLista => ob = ob.appendChild(makeNumreradLista())
          case BokstavLista => ob = ob.appendChild(makeBokstavslista())
          case StreckLista => ob = ob.appendChild(makeStrecksatslista())
          case StyckeH => ob = ob.appendChild(makeStycke(None))
          // division headings occur inside appendixes/provisions — the
          // reference appends them generically (sfs_parser.py:459-464)
          case AvdH => ob = ob.appendChild(makeAvdelning())
          case UndAvdH => ob = ob.appendChild(makeUnderavdelning())
          case TabH => ob = ob.appendChild(makeTabell())
          case UKapH => ob = ob.appendChild(makeUpphavtKapitel())
          case UParH => ob = ob.appendChild(makeUpphavdParagraf())
        }
      }
      ob
    }

    /** makeOvergangsbestammelser (sfs_parser.py:417-451): the tail
      * container. rubrikSaknas mirrors the sfs_parser.py:102-107 special
      * case — a bare bestämmelse hit at the top level wraps itself in a
      * container with the placeholder rubrik. Initial un-keyed
      * provisions wrap as one bestämmelse with an assumed sfsnr
      * (the reference guesses the document's own id; without a basefile
      * the parser uses its documented fallback "0000:000"). */
    def makeOvergangsbestammelser(rubrikSaknas: Boolean): TreeNode = {
      val rubrik =
        if (rubrikSaknas) "[Övergångsbestämmelser]"
        else normalize(reader.readparagraph())
      var obs = TreeNode("Overgangsbestammelser", Vector("rubrik" -> rubrik))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case BilagaH | Eof => go = false
          case ObH => obs = obs.appendChild(makeOvergangsbestammelse())
          case other =>
            val res = other match {
              case Kap => makeKapitel()
              case Par => makeParagraf()
              case Rub => makeRubrik()
              case NumLista => makeNumreradLista()
              case BokstavLista => makeBokstavslista()
              case StreckLista => makeStrecksatslista()
              case AvdH => makeAvdelning()
              case UndAvdH => makeUnderavdelning()
              case TabH => makeTabell()
              case UKapH => makeUpphavtKapitel()
              case UParH => makeUpphavdParagraf()
              case _ => makeStycke(None)
            }
            obs = obs.appendChild(TreeNode("Overgangsbestammelse",
              Vector("sfsnr" -> basefile.getOrElse("0000:000")))
              .appendChild(res))
        }
      }
      obs
    }

    /** makeBilaga (sfs_parser.py:468-487), minus andringsDatum. */
    def makeBilaga(): TreeNode = {
      val (rubrik0, upphor, ikraft) =
        andringsDatum(normalize(reader.readparagraph()))
      val rubrik = normalize(rubrik0)
      var bn = TreeNode("Bilaga",
        Vector("rubrik" -> rubrik.replace(" /Bilagan är inte med här/", ""))
          ++ upphor.map("upphor" -> _) ++ ikraft.map("ikrafttrader" -> _))
      var go = true
      while (go && !reader.eof) {
        guess() match {
          case Blank => reader.readline()
          case BilagaH | ObsH | Eof => go = false
          case Kap => bn = bn.appendChild(makeKapitel())
          case Par => bn = bn.appendChild(makeParagraf())
          case Rub => bn = bn.appendChild(makeRubrik())
          case NumLista => bn = bn.appendChild(makeNumreradLista())
          case BokstavLista => bn = bn.appendChild(makeBokstavslista())
          case StreckLista => bn = bn.appendChild(makeStrecksatslista())
          case StyckeH => bn = bn.appendChild(makeStycke(None))
          case ObH => bn = bn.appendChild(makeOvergangsbestammelse())
          case TabH => bn = bn.appendChild(makeTabell())
          case AvdH => bn = bn.appendChild(makeAvdelning())
          case UndAvdH => bn = bn.appendChild(makeUnderavdelning())
          case UKapH => bn = bn.appendChild(makeUpphavtKapitel())
          case UParH => bn = bn.appendChild(makeUpphavdParagraf())
        }
      }
      bn
    }

    // ---- makeForfattning (sfs_parser.py:83-111): a leading
    // /Träder i kraft I:…/ line marks the whole statute
    var b = {
      while (!reader.eof && reader.peekline().trim.isEmpty)
        reader.readline()
      val first = if (reader.eof) "" else reader.peekline()
      andringsDatum(first)._3 match {
        case Some(v) =>
          reader.readline()
          TreeNode("Forfattning", Vector("ikrafttrader" -> v))
        case None => TreeNode("Forfattning")
      }
    }
    while (!reader.eof) {
      guess() match {
        case Blank => reader.readline()
        case Eof => ()
        case Kap => b = b.appendChild(makeKapitel())
        case Par => b = b.appendChild(makeParagraf())
        case Rub => b = b.appendChild(makeRubrik())
        case StyckeH => b = b.appendChild(makeStycke(None))
        case TabH => b = b.appendChild(makeTabell())
        case NumLista => b = b.appendChild(makeNumreradLista())
        case BokstavLista => b = b.appendChild(makeBokstavslista())
        case StreckLista => b = b.appendChild(makeStrecksatslista())
        case AvdH => b = b.appendChild(makeAvdelning())
        case UndAvdH => b = b.appendChild(makeUnderavdelning())
        case UKapH => b = b.appendChild(makeUpphavtKapitel())
        case UParH => b = b.appendChild(makeUpphavdParagraf())
        case ObsH => b = b.appendChild(makeOvergangsbestammelser(false))
        // bare bestämmelse with no separator: wrap with the placeholder
        // rubrik (sfs_parser.py:102-107)
        case ObH => b = b.appendChild(makeOvergangsbestammelser(true))
        case BilagaH => b = b.appendChild(makeBilaga())
      }
    }
    b
  }
}
