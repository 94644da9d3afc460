package graft.parse

import java.util.regex.Pattern
import graft.model.Triple

/** Agency-regulation (myndighetsföreskrift) metadata extraction — the
  * parse core of the reference's largest unported in-domain module
  * (/root/reference/ferenda/sources/legal/se/myndfskr.py, 2,862 LoC;
  * the remainder is per-agency HTTP download plumbing, out of scope in
  * the zero-egress sandbox). The chain ported here is exactly what the
  * reference's own fixture suite drives (test/integrationMyndFskr.py:
  * sanitize_text → extract_metadata → sanitize_metadata →
  * polish_metadata): forward regex property tests page-by-page until
  * rpubl:beslutsdatum is found, reverse tests over
  * whitespace-normalized paragraphs from the back until
  * rpubl:ikrafttradandedatum, the metadata sanitation rules, and the
  * polish step that turns the string map into typed triples — agency
  * lookup with difflib-style fuzzy matching, change/repeal act URI
  * minting through the fs altLabel table, Celex directive URIs,
  * bemyndigande through the LAGRUM citation parser ([[LawRef]]) with
  * the reference's over-match filter, Swedish date parsing including
  * the "vid utgången av <month> <year>" end-of-month form and the
  * 'denna dag'/'utkom från trycket' indirections.
  *
  * Resource tables (the reference's commondata,
  * sources/legal/se/res/extra/swedishlegalsource.ttl) are parameters —
  * the spec loads them from the reference's own file, production use
  * supplies its own graph (the LawRef dictionary pattern). */
object MyndFskr {

  /** The commondata slice the parse chain needs. */
  final case class Resources(
      /** skos:altLabel → författningssamling URI ("AFS" → …/serie/fs/afs). */
      fsByAltLabel: Map[String, String],
      /** fs URI → dcterms:publisher org URI. */
      fsPublisher: Map[String, String],
      /** foaf:name → org URI (fuzzy-matched at cutoff 0.8,
        * documentrepository.py:500-533). */
      orgByName: Map[String, String])

  final case class ParseError(msg: String) extends RuntimeException(msg)

  private val RinfoPubl = "http://rinfo.lagrummet.se/publ/"

  /** " ".join(s.split()) — util.normalize_space. Python str.split()
    * splits on ANY Unicode whitespace (U+202F narrow no-break space,
    * U+2009 thin space — both live in these PDFs), so the pattern
    * needs UNICODE_CHARACTER_CLASS; Java's default \s would leave
    * them in and break the downstream citation tokenizers. */
  private val WsRx = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)
  def normalizeSpace(s: String): String =
    WsRx.split(s).filter(_.nonEmpty).mkString(" ")

  /** _basefile_frag_to_altlabel (myndfskr.py:352-358). */
  private val fragToAlt = Map(
    "ELSAKFS" -> "ELSÄK-FS", "HSLFFS" -> "HSLF-FS", "FOHMFS" -> "FoHMFS",
    "RAFS" -> "RA-FS", "SVKFS" -> "SvKFS")

  /** Hand-curated per-basefile fixes (myndfskr.py:148-153). */
  private val baseprops: Map[String, Map[String, String]] = Map(
    "nfs/2004:5" -> Map("rpubl:beslutadAv" -> "Naturvårdsverket"),
    "sosfs/1982:13" -> Map("rpubl:beslutadAv" -> "Socialstyrelsen"),
    "sjvfs/1991:2" -> Map("dcterms:identifier" -> "SJVFS 1991:2"),
    "skvfs/2006:13" -> Map("dcterms:identifier" -> "SKVFS 2006:13"),
    "skvfs/2006:11" -> Map("dcterms:identifier" -> "SKVFS 2006:11"))

  // ------------------------------------------------- regex test tables
  /** fwdtests (myndfskr.py:526-549) — insertion order is significant
    * (first matching pattern per property wins on a page). */
  private def fwdTests(alias: String): Vector[(String, Vector[String])] = {
    val base = Vector(
      "dcterms:issn" -> Vector("^ISSN (\\d+\\-\\d+)$"),
      "dcterms:title" -> Vector(
        "((?:Föreskrifter|[\\w ]+s (?:föreskrifter|allmänna råd)).*?)[;\\n](\\n|beslutade den)"),
      "dcterms:identifier" -> Vector("^([A-ZÅÄÖ-]+FS\\s\\s?\\d{4}:\\d+)$"),
      "rpubl:utkomFranTryck" -> Vector(
        "Utkom från\\strycket\\s+den\\s(\\d+ \\w+ \\d{4})",
        "Utkom från\\strycket\\s+(\\d{4}-\\d{2}-\\d{2})"),
      "rpubl:omtryckAv" -> Vector("^(Omtryck)$"),
      "rpubl:genomforDirektiv" -> Vector("Celex (3\\d{2,4}\\w\\d{4})"),
      "rpubl:beslutsdatum" -> Vector(
        "(?:har beslutats|[Bb]eslutade|beslutat|[Bb]eslutad)(?:\\sden|) (\\d+ \\w+( \\d{4}|))",
        "Beslutade av (?:[A-ZÅÄÖ][\\w ]+) den (\\d+ \\w+ \\d{4}).",
        "utfärdad den (\\d+ \\w+ \\d{4}) tillkännages härmed i andra hand.",
        "(?:utfärdad|meddelad)e? den (\\d+ \\w+ \\d{4})."),
      "rpubl:beslutadAv" -> Vector(
        "\\s(?:meddelar|lämnar|föreskriver|beslutar)\\s([A-ZÅÄÖ][\\w ]+?)\\d?\\s",
        "\\n\\s*([A-ZÅÄÖ][\\w ]+?)\\d? (?:meddelar|lämnar|föreskriver|beslutar)"),
      "rpubl:bemyndigande" -> Vector(
        " ?(?:meddelar|föreskriver|Föreskrifterna meddelas|Föreskrifterna upphävs)\\d?,? (?:följande |)med stöd av\\s(.*?) ?(?:att|efter\\ssamråd|dels|följande|i fråga om|och lämnar allmänna råd|och beslutar följande allmänna råd|\\.\\n)",
        "^Med stöd av (.*)\\s(?:meddelar|föreskriver)"))
    // per-agency overrides (ELSAKFS/NFS insert a specific-entity
    // pattern first; FFFS appends an Upphävande title form; SOSFS drops
    // the $ anchor on the identifier)
    alias match {
      case "elsakfs" => base.map {
        case ("rpubl:beslutadAv", ps) => "rpubl:beslutadAv" ->
          ("(?:meddelar|föreskriver)\\s(Sveriges geologiska undersökning)" +: ps)
        case kv => kv
      }
      case "nfs" => base.map {
        case ("rpubl:beslutadAv", ps) => "rpubl:beslutadAv" ->
          ("(?:meddelar|föreskriver)\\s([Ss]tatens\\s*naturvårdsverk)" +: ps)
        case kv => kv
      }
      case "fffs" => base.map {
        case ("dcterms:title", ps) => "dcterms:title" ->
          (ps :+ "^(Upphävande av .*?)\\n\\n")
        case kv => kv
      }
      case "sosfs" => base.map {
        case ("dcterms:identifier", _) => "dcterms:identifier" ->
          Vector("^([A-ZÅÄÖ-]+FS\\s\\s?\\d{4}:\\d+)")
        case kv => kv
      }
      case _ => base
    }
  }

  /** revtests (myndfskr.py:551-562). */
  private val revTests: Vector[(String, Vector[String])] = Vector(
    "rpubl:ikrafttradandedatum" -> Vector(
      "(?:Denna författning|Dessa föreskrifter|Dessa allmänna råd|Dessa föreskrifter och allmänna råd)\\d* träder i ?kraft (?:den |)(\\d+ \\w+ \\d{4})",
      "Dessa föreskrifter träder i kraft, (?:.*), i övrigt den (\\d+ \\w+ \\d{4})",
      "ska(?:ll|)\\supphöra att gälla (?:den |)(\\d+ \\w+ \\d{4}|denna dag|vid utgången av \\w+ \\d{4})",
      "träder i kraft den dag då författningen enligt uppgift på den (utkom från trycket)"),
    "rpubl:upphaver" -> Vector(
      "träder i kraft den (?:\\d+ \\w+ \\d{4}), då(.*)ska upphöra att gälla",
      "ska(?:ll|)\\supphöra att gälla vid utgången av \\w+ \\d{4}, nämligen(.*?)\\n\\n",
      "att (.*) skall upphöra att gälla (denna dag|vid utgången av \\w+ \\d{4})"))

  private def fwdPattern(p: String): Pattern =
    Pattern.compile(p, Pattern.MULTILINE | Pattern.DOTALL |
      Pattern.UNICODE_CHARACTER_CLASS)
  private def revPattern(p: String): Pattern =
    Pattern.compile(p, Pattern.MULTILINE | Pattern.UNICODE_CHARACTER_CLASS)

  // ---------------------------------------------------- sanitize_text
  /** Per-agency text sanitation (AFS margin folding myndfskr.py:
    * 1012-1043, NFS dehyphenation:1750-1752, SOSFS scan fix:2689-2695). */
  def sanitizeText(text: String, basefile: String): String = {
    val alias = basefile.split("/").head
    alias match {
      case "afs" =>
        val probableId = basefile.toUpperCase.replace("/", " ")
        val dateRx = Pattern.compile("den \\d+ \\w+ \\d{4}$",
          Pattern.UNICODE_CHARACTER_CLASS)
        val out = new StringBuilder
        var margin = ""
        var inmargin = false
        text.split("\n", -1).foreach { line =>
          val m = dateRx.matcher(line)
          val newline: String =
            if (line.endsWith(probableId) && margin.isEmpty &&
                line.length > probableId.length) {
              inmargin = true
              margin += probableId + "\n"
              line.substring(0, line.indexOf(probableId))
            } else if (inmargin && line.endsWith("Utkom från trycket")) {
              margin += "Utkom från trycket\n"
              line.substring(0, line.indexOf("Utkom från trycket"))
            } else if (inmargin && m.find()) {
              margin += m.group(0) + "\n"
              line.substring(0, m.start)
            } else if (inmargin && line.isEmpty) {
              inmargin = false
              "\n" + margin + "\n"
            } else line
          out.append(newline).append("\n")
        }
        out.toString
      case "nfs" =>
        text.replace("Statens na—\n\nturvårdsverk", "Statens naturvårdsverk")
      case "sosfs" if basefile == "sosfs/1996:21" =>
        text.replace("Ansvarigutgiyare", "Ansvarig utgivare")
      case _ => text
    }
  }

  // ------------------------------------------------ extract_metadata
  /** metadata_from_basefile (myndfskr.py:361-395, konsolidering path
    * out of scope — no fixture exercises it). */
  def metadataFromBasefile(basefile: String, res: Resources)
      : Map[String, String] = {
    require(basefile.contains("/"), s"$basefile is not a valid basefile")
    val Array(frag, real) = basefile.split("/", 2)
    val fsLabel = fragToAlt.getOrElse(frag.toUpperCase, frag.toUpperCase)
    val fs = res.fsByAltLabel.getOrElse(fsLabel,
      throw ParseError(s"unknown författningssamling $fsLabel"))
    val Array(year, no) = real.split(":", 2)
    Map("rpubl:forfattningssamling" -> fs,
      "rpubl:arsutgava" -> year, "rpubl:lopnummer" -> no)
  }

  /** parse_metadata_from_textreader (myndfskr.py:565-634) plus SOSFS's
    * cover-page skip (myndfskr.py:2797-2813). Pages split on form
    * feed (TextReader.readpage). */
  def extractMetadata(text: String, basefile: String, res: Resources)
      : Map[String, String] = {
    val alias = basefile.split("/").head
    val props = scala.collection.mutable.LinkedHashMap[String, String](
      metadataFromBasefile(basefile, res).toSeq: _*)
    props ++= baseprops.getOrElse(basefile, Map.empty)
    val pagesAll = text.split("", -1).toVector
    // SOSFS skips cover pages until the publisher block appears; the
    // reverse pass still seeks the whole stream (reader.seek(0))
    var pages = pagesAll
    if (alias == "sosfs") {
      val idx = pages.indexWhere(p =>
        p.contains("Ansvarig utgivare") || p.contains("Utgivare"))
      if (idx < 0)
        throw ParseError(s"$basefile: Could not find proper first page")
      pages = pages.drop(idx)
    }
    val tests = fwdTests(alias)
    // NB divergence from the current reference CODE, cited: its loop
    // keeps only the breaking page's finds, but its own comment
    // (myndfskr.py:566-573: "AFS 2014:44 requires that we glean
    // dcterms:title from page 1 and rpubl:beslutsdatum from page 2")
    // and its own fixture graphs (afs-2014-44.n3 carries the page-1
    // title) specify ACCUMULATION across pages — the fixtures are the
    // behavior contract here, so props accumulate until the required
    // rpubl:beslutsdatum page breaks the scan (everything gleaned is
    // still discarded when no page has it, the giving-up semantics).
    val pageprops = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var found = false
    val pageIt = pages.iterator
    while (!found && pageIt.hasNext) {
      val page = pageIt.next()
      tests.foreach { case (prop, pats) =>
        if (!props.contains(prop) && !pageprops.contains(prop)) {
          pats.iterator
            .map(p => fwdPattern(p).matcher(page))
            .find(_.find())
            .foreach(m => pageprops(prop) = normalizeSpace(m.group(1)))
        }
      }
      if (pageprops.contains("rpubl:beslutsdatum")) found = true
    }
    if (!found) pageprops.clear() // reference logs + gives up
    props ++= pageprops

    // reverse pass: paragraph-normalized pages from the back
    val revIt = pagesAll.reverseIterator
    var done = false
    while (!done && revIt.hasNext) {
      val page = revIt.next().split("\n\n", -1)
        .map(normalizeSpace).mkString("\n\n")
      revTests.foreach { case (prop, pats) =>
        if (!props.contains(prop)) {
          // the reference tries every pattern without break — the LAST
          // matching pattern wins
          pats.foreach { p =>
            val m = revPattern(p).matcher(page)
            if (m.find()) props(prop) = normalizeSpace(m.group(1))
          }
        }
      }
      if (props.contains("rpubl:ikrafttradandedatum")) done = true
    }
    props.toMap
  }

  /** sanitize_basefile (myndfskr.py:210-226): normalize an identifier
    * ("DVFS 2012:4", "ELSÄK-FS 2012.04") to a canonical
    * `fs/year:number` basefile, minting the series fragment from the
    * identifier's own FS label. `fallbackFs` plays the role of the
    * repo's forfattningssamlingar()[0] for labels with no series part. */
  def sanitizeBasefile(identifier: String, fallbackFs: String): String = {
    val segments = identifier.toLowerCase.split("[ ./:_-]+").toVector
      .filter(_.nonEmpty)
    val normalized = segments.init :+ segments.last.toInt.toString
    normalized.length match {
      case 2 => s"$fallbackFs/${normalized(0)}:${normalized(1)}"
      case 3 => s"${normalized(0)}/${normalized(1)}:${normalized(2)}"
      case 4 if normalized(1) == "fs" => // eg ELSÄK-FS, HSLF-FS
        s"${normalized(0)}fs/${normalized(2)}:${normalized(3)}"
      case _ =>
        throw ParseError(s"Can't sanitize $identifier")
    }
  }

  // ----------------------------------------------- sanitize_metadata
  /** myndfskr.py:634-683 (the DocumentEntry fallback is download-side,
    * out of scope). Returns possibly-updated props. */
  def sanitizeMetadata(props0: Map[String, String], basefile: String,
                       res: Resources): Map[String, String] = {
    var props = props0
    props.get("dcterms:title").foreach { t =>
      if (t.contains("denna författning har beslutats den"))
        props -= "dcterms:title"
      else if (t.contains("\nbeslutade den ") ||
               t.contains("; beslutade den "))
        props += "dcterms:title" -> t.split("beslutade den ")(0)
    }
    props.get("rpubl:bemyndigande").foreach { b =>
      props += "rpubl:bemyndigande" -> b.replace('–', '-')
    }
    props.get("dcterms:identifier") match {
      case Some(id0) =>
        var id = id0
        if (Pattern.compile("\\d{4}-\\d+").matcher(id).find()) {
          id = id.replaceAll("(\\d{4})-(\\d+)", "$1:$2")
          props += "dcterms:identifier" -> id
        }
        val Array(_, year, no) = id.split("[ :]")
        if (year != props("rpubl:arsutgava") ||
            no != props("rpubl:lopnummer")) {
          // re-derive the whole basefile from the identifier itself
          // (myndfskr.py:665-667 via sanitize_basefile:210-226) — the
          // identifier can also name a DIFFERENT forfattningssamling
          // than the assumed basefile's series fragment
          val realbasefile = sanitizeBasefile(id, basefile.split("/").head)
          props ++= metadataFromBasefile(realbasefile, res)
        }
      case None =>
        val Array(pub0, year, ordinal) =
          basefile.toUpperCase.split("[/:_]")
        val pub = fragToAlt.getOrElse(pub0, pub0)
        props += "dcterms:identifier" -> s"$pub $year:$ordinal"
    }
    props
  }

  // ------------------------------------------------------ polish step
  private val swedishMonths = Map(
    "januari" -> 1, "jan" -> 1, "februari" -> 2, "feb" -> 2, "febr" -> 2,
    "mars" -> 3, "mar" -> 3, "april" -> 4, "apr" -> 4, "maj" -> 5,
    "juni" -> 6, "jun" -> 6, "juli" -> 7, "jul" -> 7, "augusti" -> 8,
    "aug" -> 8, "september" -> 9, "sep" -> 9, "sept" -> 9,
    "oktober" -> 10, "okt" -> 10, "november" -> 11, "nov" -> 11,
    // "vid utgången av år 2006" = end of December — the reference maps
    // the word "år" to month 12 (swedishlegalsource.py:257)
    "december" -> 12, "dec" -> 12, "år" -> 12)

  /** parse_swedish_date (swedishlegalsource.py:1474-1545) for the full
    * forms this chain needs: "3 februari 2010", ISO, and
    * "vid utgången av december 1999" (last day of the month). */
  def parseSwedishDate(datestr: String): String = {
    if (datestr.startsWith("vid utgången av")) {
      val parts = datestr.split("\\s+")
      val month = swedishMonths.getOrElse(parts(3),
        throw ParseError(s"bad month in '$datestr'"))
      val year = parts(4).toInt
      val day = java.time.YearMonth.of(year, month).lengthOfMonth()
      f"$year%04d-$month%02d-$day%02d"
    } else graft.parse.DvParser.SwedishDate.toIso(datestr)
      .getOrElse(throw ParseError(s"Couldn't parse date '$datestr'"))
  }

  /** difflib.get_close_matches-backed lookup_resource
    * (documentrepository.py:500-533): exact first, else the
    * best-ratio candidate at cutoff 0.8 over foaf:name keys. */
  def lookupOrg(name: String, res: Resources): Option[String] =
    res.orgByName.get(name).orElse {
      def ratio(a: String, b: String): Double = {
        val sm = new Diff.SequenceMatcher(
          a.map(_.toString), b.map(_.toString), autojunk = false)
        val matches = sm.getMatchingBlocks().map(_._3).sum
        if (a.isEmpty && b.isEmpty) 1.0
        else 2.0 * matches / (a.length + b.length)
      }
      res.orgByName.toSeq
        .map { case (n, uri) => (ratio(name, n), n, uri) }
        .filter(_._1 >= 0.8)
        .sortBy { case (r, n, _) => (-r, n) }
        .headOption.map(_._3)
    }

  private def fsSlug(fsUri: String): String =
    fsUri.substring(fsUri.lastIndexOf('/') + 1)

  private def docUri(fsUri: String, year: String, no: String): String =
    s"$RinfoPubl${fsSlug(fsUri)}/$year:$no"

  /** lagen.nu-shaped LawRef URI → the rinfo coin form the reference's
    * minter produces ("https://lagen.nu/1977:1166#K5P2" →
    * "…publ/sfs/1977:1166#k_5-p_2"; letter suffixes split: P19a →
    * p_19_a). The rinfo fragment space only templates kapitel and
    * paragraf — stycke/punkt/mening components are DROPPED, which is
    * exactly what the fixture graphs show ("7 kap. 2 § första stycket
    * 36" → #k_7-p_2). */
  def toRinfoSfs(uri: String): String = {
    val tail = uri.substring(uri.lastIndexOf('/') + 1)
    val (id, frag) = tail.indexOf('#') match {
      case -1 => (tail, "")
      case i => (tail.substring(0, i), tail.substring(i + 1))
    }
    val base = s"${RinfoPubl}sfs/$id"
    if (frag.isEmpty) base
    else {
      val segs = Pattern.compile("([KP])(\\d+)([a-z]*)")
        .matcher(frag)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (segs.find()) {
        val kind = segs.group(1).toLowerCase
        val letter = if (segs.group(3).nonEmpty) "_" + segs.group(3) else ""
        out += s"${kind}_${segs.group(2)}$letter"
      }
      if (out.isEmpty) base else base + "#" + out.mkString("-")
    }
  }

  /** polish_metadata (myndfskr.py:685-845): the string map becomes
    * typed triples about the minted document URI. `lawConf` feeds the
    * LAGRUM citation parse of rpubl:bemyndigande. */
  def polish(props0: Map[String, String], basefile: String,
             res: Resources,
             lawConf: LawRef.Conf = LawRef.Conf(baseLaw = None))
      : (String, Set[Triple]) = {
    val alias = basefile.split("/").head
    var props = props0
    val fs = props("rpubl:forfattningssamling")

    val publisher = res.fsPublisher.getOrElse(fs,
      throw ParseError(s"Found no publisher for fs $fs"))

    var beslutadAv: Option[String] = None
    props.get("rpubl:beslutadAv").foreach { a0 =>
      val a = a0 match {
        case "Räddningsverket" => "Statens räddningsverk"
        case "Jordbruksverket" => "Statens jordbruksverk"
        case other => other
      }
      lookupOrg(a, res) match {
        case Some(uri) => beslutadAv = Some(uri)
        case None if alias == "ffs" => // enacted by non-enumerable entities
        case None => throw ParseError(s"Couldn't look up entity '$a'")
      }
    }

    var andrar: Option[String] = None
    var upphaverRaw = props.get("rpubl:upphaver")
    props.get("dcterms:title").foreach { title =>
      if (Pattern.compile(
          "^(Föreskrifter|[\\w ]+s föreskrifter) om ändring (i|av) ",
          Pattern.UNICODE_CHARACTER_CLASS).matcher(title).find()) {
        val m = Pattern.compile(
          "([A-ZÅÄÖ-]+FS|) ?(\\d{4}) ?:(\\d+)").matcher(title)
        if (m.find()) {
          val fsLabel =
            if (m.group(1).nonEmpty) m.group(1)
            else props("dcterms:identifier").split(" ")(0)
          val origFs = res.fsByAltLabel.getOrElse(fsLabel,
            throw ParseError(s"unknown fs $fsLabel in title"))
          andrar = Some(docUri(origFs, m.group(2), m.group(3)))
        } // else: reference logs a warning and carries on
      }
      if (Pattern.compile(
          "^(Föreskrifter|[\\w ]+s föreskrifter) om upphävande av",
          Pattern.UNICODE_CHARACTER_CLASS).matcher(title).find() &&
          upphaverRaw.isEmpty)
        upphaverRaw = Some(title)
    }

    // a date that cannot be parsed stays a plain-string literal — the
    // reference reassigns attributes[key] to the indirected value BEFORE
    // the parse attempt (myndfskr.py:777-787), so its unparsable fallback
    // is the resolved raw string, never the 'denna dag' sentinel; the
    // sentinel indirection applies only to rpubl:ikrafttradandedatum
    def dateOf(key: String): Option[Either[String, String]] =
      props.get(key).map { v0 =>
        val v =
          if (key == "rpubl:ikrafttradandedatum") v0 match {
            case "denna dag" => props("rpubl:beslutsdatum")
            case "utkom från trycket" => props("rpubl:utkomFranTryck")
            case other => other
          } else v0
        try Right(parseSwedishDate(v))
        catch { case _: Exception => Left(v) }
      }

    val genomfor = props.get("rpubl:genomforDirektiv").map(celex =>
      s"http://rinfo.lagrummet.se/ext/eur-lex/${celex.toLowerCase}")

    val bemyndiganden: Seq[String] =
      props.get("rpubl:bemyndigande").toSeq.flatMap { b0 =>
        val b = b0.replace("­ ", "")
        val uris = LawRef.parse(b, lawConf).flatMap(_.uri)
        // over-match filter (myndfskr.py:805-816): drop a uri when a
        // strictly longer one extends it
        val filtered = uris.filter(u =>
          !uris.exists(c => c.length > u.length && c.startsWith(u)))
        filtered.map(toRinfoSfs).distinct
      }

    val upphaver: Seq[String] = upphaverRaw.toSeq.flatMap { raw =>
      val m = Pattern.compile("([A-ZÅÄÖ-]+FS \\d{4}:\\d+)")
        .matcher(normalizeSpace(raw))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) {
        val Array(fsl, year, no) = m.group(1).split("[ :]")
        val fsUri = res.fsByAltLabel.getOrElse(fsl,
          throw ParseError(s"unknown fs $fsl in upphaver"))
        out += docUri(fsUri, year, no)
      }
      out.toSeq
    }

    val rdfType = props.get("dcterms:title") match {
      case Some(t) if t.contains("allmänna råd") &&
          !t.contains("föreskrifter") =>
        graft.model.Vocab.rpubl("AllmannaRad")
      case _ => graft.model.Vocab.rpubl("Myndighetsforeskrift")
    }

    val uri = docUri(fs, props("rpubl:arsutgava"), props("rpubl:lopnummer"))
    val dct = graft.model.Vocab.dcterms _
    val rp = graft.model.Vocab.rpubl _
    val xsdDate = graft.model.Vocab.xsd("date")
    def lit(p: String, o: String) = Triple.lit(uri, p, o, "")
    def date(p: String, o: Either[String, String]) = o match {
      case Right(iso) =>
        Triple(uri, p, iso, objIsLiteral = true, Some(xsdDate), None, "")
      case Left(raw) => lit(p, raw)
    }
    def ref(p: String, o: String) = Triple.uri(uri, p, o, "")

    val triples = Set.newBuilder[Triple]
    triples += Triple.uri(uri, graft.model.Vocab.RDF_TYPE, rdfType, "")
    triples += ref(dct("publisher"), publisher)
    triples += ref(rp("forfattningssamling"), fs)
    triples += lit(rp("arsutgava"), props("rpubl:arsutgava"))
    triples += lit(rp("lopnummer"), props("rpubl:lopnummer"))
    triples += lit(dct("identifier"), props("dcterms:identifier"))
    props.get("dcterms:issn").foreach(v => triples += lit(dct("issn"), v))
    props.get("dcterms:title").foreach(t => triples +=
      Triple(uri, dct("title"), t, objIsLiteral = true, None, Some("sv"), ""))
    beslutadAv.foreach(o => triples += ref(rp("beslutadAv"), o))
    dateOf("rpubl:beslutsdatum").foreach(d =>
      triples += date(rp("beslutsdatum"), d))
    dateOf("rpubl:utkomFranTryck").foreach(d =>
      triples += date(rp("utkomFranTryck"), d))
    dateOf("rpubl:ikrafttradandedatum").foreach(d =>
      triples += date(rp("ikrafttradandedatum"), d))
    genomfor.foreach(o => triples += ref(rp("genomforDirektiv"), o))
    bemyndiganden.foreach(o => triples += ref(rp("bemyndigande"), o))
    upphaver.foreach(o => triples += ref(rp("upphaver"), o))
    andrar.foreach(o => triples += ref(rp("andrar"), o))
    (uri, triples.result())
  }

  /** The full fixture chain (integrationMyndFskr.py parametric_test):
    * sanitize_text → extract → sanitize_metadata → polish. */
  def parse(text: String, basefile: String, res: Resources,
            lawConf: LawRef.Conf = LawRef.Conf(baseLaw = None))
      : (String, Set[Triple]) = {
    val sanitized = sanitizeText(text, basefile)
    val props = sanitizeMetadata(
      extractMetadata(sanitized, basefile, res), basefile, res)
    polish(props, basefile, res, lawConf)
  }
}
