package graft.parse

import java.util.regex.{Matcher, Pattern}

/** Court-verdict (DV / rättsfallsreferat) STRUCTURE parser — the referat
  * slice of the reference's DV repository
  * (/root/reference/ferenda/sources/legal/se/dv.py:1599-2358): a referat
  * text → Body of Delmal (case parts I/II/…), Instans (court instances,
  * detected by fixed court-name headings plus the wording-pattern matcher
  * table), Dom (verdict paragraphs with court + avgörandedatum),
  * Domskal/Domslut, Betankande, Skiljaktig (dissents), Tillagg, Endmeta,
  * Heading and (Ordered)Paragraph — on the same [[FsmParser]] engine the
  * reference drives with set_recognizers/@newstate.
  *
  * Ported faithfully (all line-cited to dv.py):
  *  - the `rx` matcher table verbatim (dv.py:1607-1814), with the same
  *    per-court filtering (a matcher applies when the basefile's court
  *    code is in its court list, or it has none);
  *  - re_courtname fixed headings (dv.py:1599-1601);
  *  - analyze_instans/analyze_dom/analyze_domskal/analyze_domslut
  *    (dv.py:1969-2080): sentence-bounded scanning (3/1/1/1 sentences),
  *    the "SAKEN" special case, the domskal false-positive guard in
  *    analyze_instans;
  *  - split_sentences' abbreviation-safe heuristic (dv.py:1960-1967);
  *  - is_instans state rules (dv.py:1846-1878): the HD→tingsrätt
  *    regression guard, equivalent-court merge (canonicalize HD/HovR),
  *    and the root-level "anything starts an instans" fallback;
  *  - the transition table incl. commonstates and the betankande→domskal
  *    push (dv.py:2255-2345), ordered paragraphs only for NJA/MD referats
  *    (dv.py:2346-2348), defaultcourt for PMD/MMD (dv.py:2355-2356);
  *  - make_instans' court refinement from Dom children ("longer
  *    courtnames are better", dv.py:2142-2149).
  *
  * Scoped out (cited): parse_constitution name/role splitting
  * (dv.py:2085-2106 — the constitution group is matched but not
  * decomposed), and the OCR-damage special cases dv.py carries for
  * specific basefiles. Golden-tested in DvParserSpec against the
  * reference's OWN recognizer test cases (test/integrationDV.py).
  *
  * Pure per-row logic: one [[parse]] call per document inside a Dataset
  * map stage.
  */
object DvParser {

  // ------------------------------------------------------- swedish dates
  /** parse_swedish_date slice (swedishlegalsource.py:232-257, 1474-1545):
    * full dates only (ISO, sloppy-separator ISO, "3 februari 2010" /
    * "8 dec. 1997" / "d 15 sept 1980" forms) → ISO yyyy-mm-dd string.
    * The gYear/gYearMonth partial forms are not needed by the referat
    * matchers. */
  object SwedishDate {
    private val months = Map(
      "januari" -> 1, "jan" -> 1, "februari" -> 2, "feb" -> 2, "febr" -> 2,
      "mars" -> 3, "mar" -> 3, "april" -> 4, "apr" -> 4, "maj" -> 5,
      "juni" -> 6, "jun" -> 6, "juli" -> 7, "jul" -> 7,
      "augusti" -> 8, "aug" -> 8, "september" -> 9, "sep" -> 9, "sept" -> 9,
      "oktober" -> 10, "okt" -> 10, "november" -> 11, "nov" -> 11,
      "december" -> 12, "dec" -> 12)
    private val Iso = Pattern.compile("(\\d{4})-(\\d{2})-(\\d{2})")
    private val Anom = Pattern.compile("(\\d+)[^\\d]{1,3}(\\d+)[^\\d]{1,3}(\\d+)")

    def toIso(datestr0: String): Option[String] = {
      if (datestr0 == null || datestr0.isEmpty) return None
      val mi = Iso.matcher(datestr0)
      if (mi.lookingAt())
        return Some(s"${mi.group(1)}-${mi.group(2)}-${mi.group(3)}")
      val ma = Anom.matcher(datestr0)
      if (ma.lookingAt()) {
        val y0 = ma.group(1)
        val year =
          if (y0.length < 4) { // '80-01-01' → 1980, '79-…' → 2079
            if (y0.toInt >= 80) 1900 + y0.toInt else 2000 + y0.toInt
          } else y0.toInt
        return Some(f"$year%04d-${ma.group(2).toInt}%02d-${ma.group(3).toInt}%02d")
      }
      // "3 februari 2010" / "8 dec. 1997" (letter/digit runs split first)
      var d = datestr0.toLowerCase
      d = d.replaceAll("([a-zåäö])(\\d)", "$1 $2")
      d = d.replaceAll("(\\d)([a-zåäö])", "$1 $2")
      val comps = d.trim.split("\\s+")
      if (comps.length < 3) return None
      val year = comps.last.toIntOption.getOrElse(return None)
      val monName = comps(comps.length - 2).stripSuffix(".")
      val month = months.getOrElse(monName, return None)
      val day = comps(comps.length - 3).toIntOption.getOrElse(return None)
      Some(f"$year%04d-$month%02d-$day%02d")
    }
  }

  // ------------------------------------------------------- matcher table
  /** One entry of dv.py's rx table (1607-1814). `search` ⇔ the entry's
    * method was re.search instead of re.match. */
  final case class Pat(name: String, regex: String, search: Boolean,
                       types: Set[String], courts: Option[Set[String]]) {
    val pattern: Pattern =
      Pattern.compile(regex, Pattern.UNICODE_CHARACTER_CLASS)
    val groups: Set[String] =
      "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r.findAllMatchIn(regex)
        .map(_.group(1)).toSet
    def matcherAt(s: String): Option[Matcher] = {
      val m = pattern.matcher(s)
      val hit = if (search) m.find() else m.lookingAt()
      if (hit) Some(m) else None
    }
    def group(m: Matcher, g: String): Option[String] =
      if (groups.contains(g)) Option(m.group(g)).filter(_.nonEmpty) else None
  }

  private val hovrCourts =
    Some(Set("HDO", "HGO", "HNN", "HON", "HSB", "HSV", "HVS"))
  private val frCourts = Some(Set("REG", "HFD", "MIG"))

  /** dv.py:1607-1814, verbatim (Python (?P<x>…) → Java (?<x>…)). */
  val patterns: Vector[Pat] = Vector(
    Pat("fr-överkl",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) överklagade (beslutet|domen) " +
      "till (?<court>(Förvaltningsrätten|Länsrätten|Kammarrätten) i \\w+(| län)" +
      "(|, migrationsdomstolen|, Migrationsöverdomstolen)|" +
      "Högsta förvaltningsdomstolen)( \\((?<date>\\d+-\\d+-\\d+), " +
      "(?<constitution>[\\w\\.\\- ,]+)\\)|$)",
      search = false, Set("instans"), frCourts),
    Pat("fr-dom",
      "(?<court>(Förvaltningsrätten|" +
      "Länsrätten|Kammarrätten) i \\w+(| län)" +
      "(|, migrationsdomstolen|, Migrationsöverdomstolen)|" +
      "Högsta förvaltningsdomstolen) \\((?<date>\\d+-\\d+-\\d+), " +
      "(?<constitution>[\\w\\.\\- ,]+)\\)",
      search = false, Set("dom"), frCourts),
    Pat("tr-dom",
      "(?<court>TR:n|Tingsrätten|HovR:n|Hovrätten|Mark- och miljödomstolen) " +
      "\\((?<constitution>[\\w\\.\\- ,]+)\\) " +
      "(anförde|fastställde|stadfäste|meddelade) (följande i |i beslut i |i |)" +
      "(dom|beslut) (d\\.|d|den) (?<date>\\d+ \\w+\\.? \\d+)",
      search = false, Set("dom"), hovrCourts),
    Pat("hd-dom",
      "Målet avgjordes efter huvudförhandling (av|i) (?<court>HD) " +
      "\\((?<constitution>[\\w:\\.\\- ,]+)\\),? som",
      search = false, Set("dom"), Some(Set("HDO"))),
    Pat("hd-dom2",
      "(?<court>HD) \\((?<constitution>[\\w:\\.\\- ,]+)\\) meddelade den " +
      "(?<date>\\d+ \\w+ \\d+) följande",
      search = false, Set("dom"), Some(Set("HDO"))),
    Pat("hd-fastst",
      "(?<court>HD) \\((?<constitution>[\\w:\\.\\- ,]+)\\) " +
      "(beslöt|fattade (slutligt|följande slutliga) beslut)",
      search = false, Set("dom"), Some(Set("HDO"))),
    Pat("mig-dom",
      "(?<court>Kammarrätten i Stockholm, Migrationsöverdomstolen)  " +
      "\\((?<date>\\d+-\\d+-\\d+), (?<constitution>[\\w\\.\\- ,]+)\\)",
      search = false, Set("dom"), Some(Set("MIG"))),
    Pat("miv-forstainstans",
      "(?<court>Migrationsverket) avslog (ansökan|ansökningarna) den " +
      "(?<date>\\d+ \\w+ \\d+) och beslutade att",
      search = false, Set("dom"), Some(Set("MIG"))),
    Pat("miv-forstainstans-2",
      "(?<court>Migrationsverket) avslog den (?<date>\\d+ \\w+ \\d+) A:s " +
      "ansökan och beslutade att",
      search = false, Set("dom"), Some(Set("MIG"))),
    Pat("mig-dom-alt",
      "I sin dom avslog (?<court>Förvaltningsrätten i Stockholm, " +
      "migrationsdomstolen) \\((?<date>\\d+- ?\\d+-\\d+), " +
      "(?<constitution>[\\w\\.\\- ,]+)\\)",
      search = false, Set("dom"), Some(Set("MIG"))),
    Pat("allm-åkl",
      "Allmän åklagare yrkade (.*)vid (?<court>(([A-ZÅÄÖ]" +
      "[a-zåäö]+ )+)(TR|tingsrätt))",
      search = false, Set("instans"), hovrCourts),
    Pat("stämning",
      "stämning å (?<svarande>.*) vid (?<court>(([A-ZÅÄÖ]" +
      "[a-zåäö]+ )+)(TR|tingsrätt))",
      search = true, Set("instans"), hovrCourts),
    Pat("ansökan",
      "ansökte vid (?<court>(([A-ZÅÄÖ][a-zåäö]+ )+)" +
      "(TR|tingsrätt)) om ",
      search = true, Set("instans"), hovrCourts),
    Pat("riksåkl",
      "Riksåklagaren väckte i (?<court>HD|HovR:n (över|för) " +
      "([A-ZÅÄÖ][a-zåäö]+ )+|[A-ZÅÄÖ][a-zåäö]+ HovR) åtal",
      search = false, Set("instans"), hovrCourts),
    Pat("tr-överkl",
      "(?<karande>[\\w\\.\\(\\)\\- ]+) (fullföljde talan|" +
      "överklagade) (|TR:ns dom.*)i (?<court>HD|(HovR:n|hovrätten) " +
      "(över|för) (Skåne och Blekinge|Västra Sverige|Nedre " +
      "Norrland|Övre Norrland)|(Svea|Göta) (HovR|hovrätt))",
      search = false, Set("instans"), hovrCourts),
    Pat("fullfölj-överkl",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) fullföljde sin talan$",
      search = false, Set("instans"), None),
    Pat("myndighetsansökan",
      "I (ansökan|en ansökan|besvär) hos (?<court>\\w+) " +
      "(om förhandsbesked|yrkade)",
      search = false, Set("instans"), Some(Set("REG", "HFD"))),
    Pat("myndighetsbeslut",
      "(?<court>\\w+) beslutade (därefter |)(den (?<date>\\d+ \\w+ \\d+)|" +
      "[\\w ]+) att",
      search = false, Set("instans"), frCourts),
    Pat("myndighetsbeslut2",
      "(?<court>[\\w ]+) (bedömde|vägrade) i (bistånds|)beslut" +
      " (|den (?<date>\\d+ \\w+ \\d+))",
      search = false, Set("instans"), Some(Set("REG", "HFD"))),
    Pat("hd-revision",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) sökte revision och yrkade(," +
      "i första hand,|, såsom hans talan fick förstås,|,|) att (?<court>HD|)",
      search = false, Set("instans"), Some(Set("HDO"))),
    Pat("hd-revision2",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) sökte revision$",
      search = false, Set("instans"), Some(Set("HDO"))),
    Pat("hd-revision3",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) sökte revision och framställde " +
      "samma yrkanden",
      search = false, Set("instans"), Some(Set("HDO"))),
    Pat("överklag-bifall",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) (anförde besvär|" +
      "överklagade) och yrkade bifall till (sin talan i " +
      "(?<prevcourt>HovR:n|TR:n)|)",
      search = false, Set("instans"), hovrCourts),
    Pat("överklag-2",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) överklagade " +
      "(för egen del |)och yrkade (i själva saken |)att " +
      "(?<court>HD|HovR:n|kammarrätten|Regeringsrätten|)",
      search = false, Set("instans"), None),
    Pat("överklag-3",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) överklagade (?<prevcourt>" +
      "\\w+)s (beslut|omprövningsbeslut|dom)( i ersättningsfrågan|) (hos|till) " +
      "(?<court>[\\w\\, ]+?)( och yrkade| och anförde|, som| \\(Sverige\\)|$)",
      search = false, Set("instans"), None),
    Pat("överklag-4",
      "(?!Även )(?<karanden>(?!HD fastställer)[\\w\\.\\(\\)\\- ]+) " +
      "överklagade ((?<prevcourt>\\w+)s (beslut|dom)|beslutet|domen)( och|$)",
      search = false, Set("instans"), None),
    Pat("hd-ansokan",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) anhöll i ansökan som inkom " +
      "till (?<court>HD) d \\d+ \\w+ \\d+",
      search = false, Set("instans"), Some(Set("HDO"))),
    Pat("hd-skrivelse",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) anförde i en till " +
      "(?<court>HD) den \\d+ \\w+ \\d+ ställd",
      search = false, Set("instans"), Some(Set("HDO"))),
    Pat("överklag-5",
      "(?!Även )(?<karanden>[\\w\\.\\(\\)\\- ]+?) överklagade " +
      "(?<prevcourt>\\w+)s (dom|domar)",
      search = false, Set("instans"), None),
    Pat("överklag-6",
      "(?<karanden>[\\w\\.\\(\\)\\- ]+) överklagade domen till " +
      "(?<court>\\w+)($| och yrkade)",
      search = false, Set("instans"), None),
    Pat("myndighetsbeslut3",
      "I sitt beslut den (?<date>\\d+ \\w+ \\d+) avslog " +
      "(?<court>\\w+)",
      search = false, Set("instans"), frCourts),
    Pat("domskal",
      "(Skäl|Domskäl|HovR:ns domskäl|Hovrättens domskäl)(\\. |$)",
      search = false, Set("domskal"), None),
    Pat("domskal-ref",
      "(Tingsrätten|TR[:\\.]n|Hovrätten|HD|Högsta förvaltningsdomstolen) " +
      "\\([^)]*\\) (meddelade|anförde|fastställde|yttrade)",
      search = false, Set("domskal"), None),
    Pat("domskal-dom-fr",
      "(?<court>(Förvaltningsrätten|" +
      "Länsrätten|Kammarrätten) i \\w+(| län)" +
      "(|, migrationsdomstolen|, Migrationsöverdomstolen)|" +
      "Högsta förvaltningsdomstolen) \\((?<date>\\d+-\\d+-\\d+), " +
      "(?<constitution>[\\w\\.\\- ,]+)\\),? yttrade",
      search = false, Set("domskal"), None),
    Pat("domslut-standalone",
      "(Domslut|(?<court>Hovrätten|HD|hd|Högsta förvaltningsdomstolen)" +
      ":?s avgörande)$",
      search = false, Set("domslut"), None),
    Pat("domslut-start",
      "(?<court>[\\w ]+(domstolen|rätten))s avgörande$",
      search = false, Set("domslut"), None))

  /** Fixed court-name headings (dv.py:1599-1601). */
  private val ReCourtname = Pattern.compile(
    "^(Högsta domstolen|Hovrätten (över|för)[A-ZÅÄÖa-zåäö ]+|" +
    "([A-ZÅÄÖ][a-zåäö]+ )(tingsrätt|hovrätt))" +
    "(|, mark- och miljödomstolen|, Mark- och miljööverdomstolen)$",
    Pattern.UNICODE_CHARACTER_CLASS)

  private val ReDelmal = Pattern.compile(
    "(I{1,3}|IV)\\.? ?(|\\(\\w+\\-\\d+\\))$", Pattern.UNICODE_CHARACTER_CLASS)
  private val ReSkiljaktig = Pattern.compile(
    "(Justitie|Kammarrätts)råde[nt] ([^\\.]*) var (skiljaktig|av skiljaktig mening)",
    Pattern.UNICODE_CHARACTER_CLASS)
  private val ReTillagg = Pattern.compile(
    "Justitieråde[nt] ([^\\.]*) (tillade för egen del|gjorde för egen del ett tillägg)",
    Pattern.UNICODE_CHARACTER_CLASS)
  private val ReEndmeta = Pattern.compile(
    "HD:s (beslut|dom|domar) meddela(de|d|t): den",
    Pattern.UNICODE_CHARACTER_CLASS)
  private val ReOrdered = Pattern.compile("(\\d+)\\.?\\s")
  private val ReOrderedStrip = Pattern.compile("^\\s*\\d+\\. ")

  def matchersFor(court: String, tpe: String): Vector[Pat] =
    patterns.filter(p => p.types.contains(tpe) &&
      p.courts.forall(_.contains(court)))

  /** split_sentences (dv.py:1960-1967): split on ". " followed by a
    * capital (or EOF), not preceded by a single capital. */
  def splitSentences(text0: String): Vector[String] = {
    val text = text0.trim.replaceAll("[\\s\\u00a0]+", " ") + " "
    text.split("(?<![A-ZÅÄÖ])\\. (?=[A-ZÅÄÖ]|$)").toVector
      .map(_.trim).filter(_.nonEmpty)
  }

  /** An analysis hit: court is Some(name), or `anyCourt` when the text
    * establishes A court without naming it (the reference's True). */
  final case class Hit(court: Option[String] = None,
                       anyCourt: Boolean = false,
                       date: Option[String] = None,
                       complete: Boolean = false)

  /** analyze_instans (dv.py:1969-2025). */
  def analyzeInstans(strchunk: String, court: String): Option[Hit] = {
    if (ReCourtname.matcher(strchunk).lookingAt())
      return Some(Hit(court = Some(strchunk), complete = true))
    val sentences = splitSentences(strchunk).take(3)
    if (sentences.isEmpty) return None
    // domskal false positive: a chunk starting like "Domskäl. …" is not
    // the start of an instans (dv.py:1994-2000 — only the 'domskal'
    // named pattern is consulted)
    val domskalPat = patterns.find(_.name == "domskal").get
    if (domskalPat.matcherAt(sentences.head).isDefined) return None
    for (sentence <- sentences; pat <- matchersFor(court, "instans")) {
      pat.matcherAt(sentence) match {
        case Some(m) =>
          val c = pat.group(m, "court").map(_.trim)
          val d = pat.group(m, "date").flatMap(SwedishDate.toIso)
          return Some(Hit(court = c, anyCourt = c.isEmpty, date = d))
        case None => ()
      }
    }
    None
  }

  /** analyze_dom (dv.py:2022-2052). */
  def analyzeDom(strchunk: String, court: String): Option[Hit] = {
    if (strchunk.trim == "SAKEN") return Some(Hit(anyCourt = true))
    for (sentence <- splitSentences(strchunk).take(1);
         pat <- matchersFor(court, "dom")) {
      pat.matcherAt(sentence) match {
        case Some(m) =>
          return Some(Hit(court = pat.group(m, "court").map(_.trim),
            date = pat.group(m, "date").flatMap(SwedishDate.toIso)))
        case None => ()
      }
    }
    None
  }

  /** analyze_domskal / analyze_domslut (dv.py:2054-2080). */
  def analyzeDomskal(strchunk: String, court: String): Boolean =
    splitSentences(strchunk).take(1).exists(s =>
      matchersFor(court, "domskal").exists(_.matcherAt(s).isDefined))

  def analyzeDomslut(strchunk: String, court: String): Option[Hit] = {
    for (sentence <- splitSentences(strchunk).take(1);
         pat <- matchersFor(court, "domslut")) {
      pat.matcherAt(sentence) match {
        case Some(m) =>
          val c = pat.group(m, "court").map(_.trim)
          return Some(Hit(court = c, anyCourt = c.isEmpty))
        case None => ()
      }
    }
    None
  }

  /** is_equivalent_court (dv.py:1881-1911). newCourt None = the
    * reference's True ("some court, unnamed"). */
  def isEquivalentCourt(newCourt: Option[String], oldCourt: String): Boolean = {
    def canon(c: String) =
      c.replace("HD", "Högsta domstolen").replace("HovR", "Hovrätt")
    newCourt match {
      case None => canon(oldCourt) == "Högsta domstolen"
      case Some(nc) => canon(nc) == canon(oldCourt)
    }
  }

  // ----------------------------------------------------------- FSM parse
  import FsmParser.{Config, Constructor, Recognizer, Transition}

  /** Parse a referat (paragraph chunks) for `basefile` ("HDO/B123-45"
    * style — the court code before '/' selects the matcher subset). */
  def parse(text: String, basefile: String): TreeNode = {
    val court = basefile.split("/")(0)
    val hasOrderedParas = Set("HDO", "MDO").contains(court.take(3))
    val defaultCourt = Map(
      "PMD" -> "Patent- och marknadsöverdomstolen",
      "MMD" -> "Mark- och miljööverdomstolen").get(court)

    // parser-level instans state (the reference's parser.current_instans)
    var currentCourt: Option[String] = None // None = no open instans
    var currentAny = false                  // open instans with unnamed court

    def peek(p: FsmParser[String]): String = p.reader.peekOpt().getOrElse("")

    def isDelmal(s: String): Boolean =
      s.trim.length < 20 && ReDelmal.matcher(s.trim).lookingAt()

    def isInstans(p: FsmParser[String]): Boolean = {
      val strchunk = peek(p)
      val res = analyzeInstans(strchunk, court)
      // HD domskäl sometimes mirrors the lower-court referat: a
      // higher→lower progression is never a new instans (dv.py:1854-1861)
      if (currentCourt.contains("Högsta domstolen") &&
          res.exists(_.court.exists(_.contains("tingsrätt")))) return false
      res match {
        case Some(hit) =>
          val open = currentCourt.isDefined
          if (open && isEquivalentCourt(hit.court, currentCourt.get)) false
          else true
        case None =>
          // at root level, anything starts a new instans (dv.py:1875-1877)
          p.states == Seq("body")
      }
    }

    val recognizers = Vector(
      Recognizer[String]("delmal", p => isDelmal(peek(p))),
      Recognizer[String]("endmeta", p => ReEndmeta.matcher(peek(p)).lookingAt()),
      Recognizer[String]("instans", isInstans),
      Recognizer[String]("dom", p => analyzeDom(peek(p), court).isDefined),
      Recognizer[String]("betankande", p => Set(
        "Målet avgjordes efter föredragning.",
        "HD avgjorde målet efter föredragning.").contains(peek(p).trim)),
      Recognizer[String]("domskal", p => analyzeDomskal(peek(p), court)),
      Recognizer[String]("domslut", p => analyzeDomslut(peek(p), court).isDefined),
      Recognizer[String]("skiljaktig", p => ReSkiljaktig.matcher(peek(p)).lookingAt()),
      Recognizer[String]("tillagg", p => ReTillagg.matcher(peek(p)).lookingAt()),
      Recognizer[String]("heading", p => {
        val s = peek(p).trim
        s.nonEmpty && s.length < 140 && !s.endsWith(".") &&
          !s.endsWith(":") && !s.startsWith("”")
      }),
      Recognizer[String]("paragraph", _ => true))

    val makeDelmal = Constructor[String]("delmal", pushesState = true, p => {
      val s = p.reader.next().trim
      val m = ReDelmal.matcher(s)
      m.lookingAt()
      currentCourt = None; currentAny = false
      val attrs = Vector("ordinal" -> m.group(1)) ++
        Option(m.group(2)).filter(_.nonEmpty)
          .map(v => "malnr" -> v.substring(1, v.length - 1))
      Some(p.makeChildren(TreeNode("Delmal", attrs)))
    })

    val makeInstans = Constructor[String]("instans", pushesState = true, p => {
      val strchunk = p.reader.next()
      val idata = analyzeInstans(strchunk, court)
      val (node0, courtName) = idata match {
        case Some(h) if h.complete =>
          (TreeNode("Instans", Vector("court" -> strchunk)), strchunk)
        case Some(h) if h.court.isDefined =>
          (TreeNode("Instans", Vector("court" -> h.court.get))
            .appendText(strchunk), h.court.get)
        case _ =>
          val c = defaultCourt.getOrElse("")
          (TreeNode("Instans",
            if (c.nonEmpty) Vector("court" -> c) else Vector.empty)
            .appendText(strchunk), c)
      }
      currentCourt = Some(if (courtName.nonEmpty) courtName else "")
      currentAny = courtName.isEmpty
      var res = p.makeChildren(node0)
      // court refinement from Dom children: longer courtnames are better
      // (dv.py:2142-2149)
      val better = res.children.collect {
        case c if c.tag == "Dom" =>
          c.attr("court").getOrElse("")
      }.filter(_.length > courtName.length).sortBy(-_.length).headOption
      better.foreach { b =>
        res = res.copy(attrs =
          res.attrs.filter(_._1 != "court") :+ ("court" -> b))
      }
      Some(res)
    })

    val makeHeading = Constructor[String]("heading", pushesState = false,
      p => Some(TreeNode("Heading", text = Some(p.reader.next().trim))))

    val makeBetankande = Constructor[String]("betankande", pushesState = true, p => {
      val b = TreeNode("Betankande").appendText(p.reader.next())
      Some(p.makeChildren(b))
    })

    val makeDom = Constructor[String]("dom", pushesState = true, p => {
      // peek, not next — is_domskal gets a chance at the same chunk
      // (dv.py:2163-2166)
      val d = analyzeDom(peek(p), court).getOrElse(Hit())
      val attrs = d.court.map("court" -> _).toVector ++
        d.date.map("avgorandedatum" -> _)
      Some(p.makeChildren(TreeNode("Dom", attrs)))
    })

    val makeDomskal = Constructor[String]("domskal", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Domskal"))))
    val makeDomslut = Constructor[String]("domslut", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Domslut"))))
    val makeSkiljaktig = Constructor[String]("skiljaktig", pushesState = true,
      p => Some(p.makeChildren(
        TreeNode("Skiljaktig").appendText(p.reader.next()))))
    val makeTillagg = Constructor[String]("tillagg", pushesState = true,
      p => Some(p.makeChildren(
        TreeNode("Tillagg").appendText(p.reader.next()))))
    val makeEndmeta = Constructor[String]("endmeta", pushesState = true,
      p => Some(p.makeChildren(
        TreeNode("Endmeta").appendText(p.reader.next()))))

    val makeParagraph = Constructor[String]("paragraph", pushesState = false, p => {
      val chunk = p.reader.next()
      if (chunk.trim.isEmpty) None
      else {
        val om = ReOrdered.matcher(chunk)
        if (hasOrderedParas && om.lookingAt())
          Some(TreeNode("OrderedParagraph",
            Vector("ordinal" -> om.group(1)))
            .appendText(ReOrderedStrip.matcher(chunk).replaceFirst("").trim))
        else Some(TreeNode("Paragraph").appendText(chunk.trim))
      }
    })

    val pop = Transition[String](None, None)
    def push(c: Constructor[String], st: String) = Transition[String](Some(c), Some(st))
    val commonstates = Seq("body", "delmal", "instans", "dom", "domskal",
      "domslut", "betankande", "skiljaktig", "tillagg")

    val transitions: Map[(String, String), Transition[String]] = Map(
      ("body", "delmal") -> push(makeDelmal, "delmal"),
      ("body", "instans") -> push(makeInstans, "instans"),
      ("body", "endmeta") -> push(makeEndmeta, "endmeta"),
      ("delmal", "instans") -> push(makeInstans, "instans"),
      ("delmal", "delmal") -> pop,
      ("delmal", "endmeta") -> pop,
      ("instans", "betankande") -> push(makeBetankande, "betankande"),
      ("instans", "domslut") -> push(makeDomslut, "domslut"),
      ("instans", "dom") -> push(makeDom, "dom"),
      ("instans", "instans") -> pop,
      ("instans", "skiljaktig") -> push(makeSkiljaktig, "skiljaktig"),
      ("instans", "tillagg") -> push(makeTillagg, "tillagg"),
      ("instans", "delmal") -> pop,
      ("instans", "endmeta") -> pop,
      ("betankande", "domskal") -> push(makeDomskal, "domskal"),
      ("betankande", "domslut") -> push(makeDomslut, "domslut"),
      ("betankande", "dom") -> pop,
      ("dom", "domskal") -> push(makeDomskal, "domskal"),
      ("dom", "domslut") -> push(makeDomslut, "domslut"),
      ("dom", "instans") -> pop,
      ("dom", "skiljaktig") -> pop,
      ("dom", "tillagg") -> pop,
      ("dom", "endmeta") -> pop,
      ("dom", "delmal") -> pop,
      ("domskal", "delmal") -> pop,
      ("domskal", "domslut") -> pop,
      ("domskal", "instans") -> pop,
      ("domslut", "delmal") -> pop,
      ("domslut", "instans") -> pop,
      ("domslut", "domskal") -> pop,
      ("domslut", "skiljaktig") -> pop,
      ("domslut", "tillagg") -> pop,
      ("domslut", "endmeta") -> pop,
      ("domslut", "dom") -> pop,
      ("skiljaktig", "domslut") -> pop,
      ("skiljaktig", "instans") -> pop,
      ("skiljaktig", "skiljaktig") -> pop,
      ("skiljaktig", "tillagg") -> pop,
      ("skiljaktig", "delmal") -> pop,
      ("skiljaktig", "endmeta") -> pop,
      ("tillagg", "tillagg") -> pop,
      ("tillagg", "delmal") -> pop,
      ("tillagg", "endmeta") -> pop,
      ("endmeta", "paragraph") -> Transition[String](Some(makeParagraph), None)) ++
      commonstates.map(s => (s, "heading") ->
        Transition[String](Some(makeHeading), None)) ++
      commonstates.map(s => (s, "paragraph") ->
        Transition[String](Some(makeParagraph), None))

    val makeBody = Constructor[String]("body", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Body"))))

    val chunks = text.split("\n\\s*\n").iterator
      .map(_.trim.replaceAll("[\\s\\u00a0]+", " ")).filter(_.nonEmpty)
    new FsmParser(Config(recognizers, transitions, "body", makeBody), chunks)
      .parse()
  }
}
