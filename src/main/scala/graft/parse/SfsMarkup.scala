package graft.parse

import java.util.regex.Pattern
import scala.collection.mutable

/** The SFS post-parse markup passes the reference runs between the
  * structure parse and serialization (sfs.py visitor_functions /
  * integrationSFS.py:51-55): URI/id construction, term-definition
  * detection, and lagrum citation marking.
  *
  *  - [[constructIds]] — construct_id (sfs.py:1131-1203) +
  *    lagen.nu's extended ordinalpredicates (lagen/nu/sfs.py:96-107):
  *    every structural element gets the fragment id its minted URI
  *    carries (K/P/S/N/R/L/B/A/U templates,
  *    swedishlegalsource.space.ttl:87-225, chained outer→inner in the
  *    attributes_to_resource descent order,
  *    swedishlegalsource.py:381-396), with the skipfragment rules
  *    (avdelning/underavdelning numbers never reach chapter-scoped
  *    fragments; chapter numbers drop out of paragraph fragments when
  *    the statute numbers sections continuously —
  *    integrationSFS.py:43-49), the duplicate-URI guard and the
  *    Tidsbestamd in-effect gate (elements.py:17-29: of two temporal
  *    versions of an element only the one in force is addressable; the
  *    other — and its children — get no ids).
  *  - [[findDefinitions]] — find_definitions (sfs.py:1219-1360): five
  *    definition shapes (definition lists, brottsrubricering two ways,
  *    parenthesis, running text) mark the defined term as a
  *    dcterms:subject LinkSubject with a begrepp URI
  *    (_term_to_subject, sfs.py:1121-1123).
  *  - [[markCitations]] — lagrum_parser.parse_recursive
  *    (swedishlegalsource.py:1589-1637 + sfs.py:182-187): every text
  *    span is scanned by the LAGRUM grammar ([[LawRef]]) with the
  *    ENCLOSING element's chapter/section as relative-reference
  *    context (the _currenturl → baseuri_attributes hack), headings
  *    and revoked stubs skipped; matches become dcterms:references
  *    LinkSubjects.
  *
  * Pure per-row logic, usable inside a Dataset map stage.
  */
object SfsMarkup {

  /** The reference harness's URI space base (integrationSFS.py:27). */
  val HarnessBase = "http://localhost:8000/res/sfs"

  // ------------------------------------------------------- in_effect
  private val DateRepr = Pattern.compile(
    "datetime\\.datetime\\((\\d+), (\\d+), (\\d+), 0, 0\\)")
  private def asDate(v: Option[String]): Option[java.time.LocalDate] =
    v.flatMap { s =>
      val m = DateRepr.matcher(s)
      if (m.matches())
        Some(java.time.LocalDate.of(m.group(1).toInt, m.group(2).toInt,
          m.group(3).toInt))
      else None
    }

  /** Tidsbestamd element classes (elements.py:53,62,112,191,225,305). */
  private val Temporal = Set(
    "Forfattning", "Rubrik", "Tabellrad", "Kapitel", "Paragraf", "Bilaga")

  /** elements.py:18-29 — a temporal element is in effect when its
    * upphör date lies ahead, its ikraftträder date lies behind, or
    * neither marker parsed as a date ("den dag regeringen bestämmer"
    * stays a string and the element counts as in force). */
  def inEffect(n: TreeNode, now: java.time.LocalDate): Boolean = {
    val up = asDate(n.attr("upphor"))
    val ik = asDate(n.attr("ikrafttrader"))
    up.exists(now.isBefore) || ik.exists(now.isAfter) ||
      (up.isEmpty && ik.isEmpty)
  }

  // ---------------------------------------------------- construct_id
  /** fragment_label per element class (elements.py:83-306). */
  private val FragLabel = Map(
    "Stycke" -> "S", "Avdelning" -> "A", "Underavdelning" -> "U",
    "Kapitel" -> "K", "Paragraf" -> "P", "Listelement" -> "N",
    "Overgangsbestammelse" -> "L", "Bilaga" -> "B")

  /** lagen.nu ordinalpredicates (lagen/nu/sfs.py:96-107) as fragment
    * letters — FragLabel plus Rubrik (rinfoex:rubriknummer → R). */
  private val OrdLetter = FragLabel + ("Rubrik" -> "R")

  /** _count_elements (sfs.py:1366-1377): fragment_label occurrence
    * counts, plus label+ordinal counts for ordinal-carrying elements. */
  def countElements(root: TreeNode): Map[String, Int] = {
    val c = mutable.Map.empty[String, Int].withDefaultValue(0)
    def walk(n: TreeNode): Unit = n.children.foreach { p =>
      FragLabel.get(p.tag).foreach { label =>
        c(label) += 1
        p.attr("ordinal").filter(_.nonEmpty)
          .foreach(o => c(label + o) += 1)
      }
      walk(p)
    }
    walk(root)
    c.toMap
  }

  /** Assign fragment ids. `now` defaults to the wall clock exactly like
    * the reference's in_effect (fixture behavior is stable for any date
    * past the newest temporal marker in the corpus). */
  def constructIds(root: TreeNode, basefile: String,
                   base: String = HarnessBase,
                   now: java.time.LocalDate = java.time.LocalDate.now())
      : TreeNode = {
    val counters = countElements(root)
    // integrationSFS.py:43-49 — chapters drop out of paragraph
    // fragments only when numbering does NOT restart per chapter
    val skipKP = counters.getOrElse("K", 0) > 1 &&
      counters.getOrElse("P1", 0) < 2
    val uris = mutable.Set.empty[String]

    def frag(state: Vector[(String, String)]): String = {
      val hasK = state.exists(_._1 == "K")
      val hasP = state.exists(_._1 == "P")
      state.filterNot { case (l, _) =>
        ((l == "A" || l == "U") && hasK) || (skipKP && l == "K" && hasP)
      }.map { case (l, o) => l + o.replace(" ", "") }.mkString
    }

    def walk(n: TreeNode, state: Vector[(String, String)]): TreeNode = {
      val seen = mutable.Map.empty[String, Int].withDefaultValue(0)
      val kids = n.children.map { c =>
        OrdLetter.get(c.tag) match {
          case Some(letter) =>
            seen(c.tag) += 1
            val ordinal = c.attr("ordinal").filter(_.nonEmpty)
              .orElse(c.attr("sfsnr"))
              .getOrElse(seen(c.tag).toString)
            val cState = state :+ (letter, ordinal)
            val f = frag(cState)
            val uri = s"$base/$basefile#$f"
            if (!uris(uri) &&
                (!Temporal(c.tag) || inEffect(c, now))) {
              uris += uri
              // id leads the attr vector (serialization order is
              // canonicalized in comparisons; this mirrors the repr)
              walk(c.copy(attrs = ("id" -> f) +: c.attrs), cState)
            } else c // no uri → no id, children not recursed (sfs.py:1190)
          case None =>
            walk(c, state)
        }
      }
      n.copy(children = kids)
    }
    walk(root, Vector.empty)
  }

  // ------------------------------------------------ find_definitions
  private def re(p: String) = Pattern.compile(p,
    Pattern.UNICODE_CHARACTER_CLASS)
  // sfs.py:1204-1217 — the definition-shape regexes, verbatim
  private val ReDefinitions = re(
    "^I (lagen|förordningen|balken|denna lag|denna förordning|denna balk" +
    "|denna paragraf|detta kapitel) (avses med|betyder|används följande)")
  private val ReBrottsdef = re(
    "\\b(döms|dömes)(?: han)?(?:,[\\w§ ]+,)? för ([\\w ]{3,50})" +
    " till (böter|fängelse)")
  private val ReBrottsdefAlt = re(
    "[Ff]ör ([\\w ]{3,50}) (döms|dömas) till (böter|fängelse)")
  private val ReParantesdef = re("\\(([\\w ]{3,50})\\)\\.")
  private val ReLoptextdef = re(
    "^Med ([\\w ]{3,50}) (?:avses|förstås) i denna (förordning|lag|balk)")
  private val ReSearchSfsId = re("\\((\\d{4}:\\d+)\\)")
  private val ReChangeNote = re("(Lag|Förordning) \\(\\d{4}:\\d+\\)\\.?$")
  private val ReBullet = re("^(\\-\\-?|\\x96) ")
  private val ReDottedNumber = re("^(\\d+ ?\\w?)\\. ")
  private val ReBokstavslista = re("^(\\w)\\) ")

  /** _term_to_subject (sfs.py:1121-1123). */
  def termToSubject(term: String): String = {
    val cap = term.substring(0, 1).toUpperCase + term.substring(1)
    s"https://lagen.nu/begrepp/${cap.replace(' ', '_')}"
  }

  private def firstStr(n: TreeNode): Option[String] =
    n.children.headOption.filter(_.tag == "str").flatMap(_.text)

  private def normSpace(s: String): String =
    s.trim.replaceAll("[\\s ]+", " ")

  /** find_definitions (sfs.py:1219-1360). `fd` is the visitor state:
    * None = off, or one of "normal"/"brottsrubricering"/"parantes"/
    * "loptext". */
  def findDefinitions(root: TreeNode): TreeNode = {
    def mkTermNode(term: String): TreeNode =
      TreeNode("LinkSubject",
        Vector("predicate" -> "dcterms:subject",
          "uri" -> termToSubject(term)), text = Some(term))

    /** Replace the LAST str child containing `term` with
      * (head, LinkSubject, tail) — empty halves dropped
      * (sfs.py:1349-1357; the reference's serializer skips them). */
    def splitIn(n: TreeNode, term: String): TreeNode = {
      val idx = n.children.lastIndexWhere(c =>
        c.tag == "str" && c.text.exists(_.contains(term)))
      if (idx < 0) n
      else {
        val t = n.children(idx).text.get
        val at = t.indexOf(term)
        val head = t.substring(0, at)
        val tail = t.substring(at + term.length)
        val repl = Vector(
          if (head.nonEmpty) Some(TreeNode.str(head)) else None,
          Some(mkTermNode(term)),
          if (tail.nonEmpty) Some(TreeNode.str(tail)) else None).flatten
        n.copy(children = n.children.patch(idx, repl, 1))
      }
    }

    def walk(n: TreeNode, fd0: Option[String]): TreeNode = {
      if (n.tag == "str" || n.text.isDefined && n.children.isEmpty)
        return n
      var fd = fd0
      if (n.tag == "Paragraf") {
        firstStr(n.children.headOption.getOrElse(TreeNode("x"))).foreach {
          t0 =>
            if (ReDefinitions.matcher(t0).lookingAt()) fd = Some("normal")
            if (ReBrottsdef.matcher(t0).find() ||
                ReBrottsdefAlt.matcher(t0).find())
              fd = Some("brottsrubricering")
            if (ReParantesdef.matcher(t0).find()) fd = Some("parantes")
            if (ReLoptextdef.matcher(t0).find()) fd = Some("loptext")
        }
        // "I denna paragraf avses med" in a LATER stycke (sfs.py:1239-1245)
        n.children.filter(_.tag == "Stycke").foreach { st =>
          firstStr(st).foreach { t =>
            if (ReDefinitions.matcher(t).lookingAt()) fd = Some("normal")
          }
        }
      }

      var term: Option[String] = None
      var splitTarget = -1 // index of the child node to split (cell case)
      if (Set("Stycke", "Listelement", "Tabellrad")(n.tag) && fd.isDefined) {
        if (n.tag == "Tabellrad") {
          // only the first cell can carry a term (sfs.py:1258-1269)
          n.children.headOption.filter(_.tag == "Tabellcell")
            .foreach { cell =>
              firstStr(cell).foreach { t =>
                if (t != "Beteckning" && t != "Begrepp" &&
                    !ReChangeNote.matcher(t).lookingAt())
                  term = Some(t)
              }
              splitTarget = 0
            }
        } else if (n.tag == "Stycke") {
          firstStr(n).foreach { t =>
            if (fd.contains("normal") &&
                !ReDefinitions.matcher(t).lookingAt()) {
              // hairy delimiter heuristics (sfs.py:1280-1296)
              var delim = ":"
              if (t.contains(" - ") &&
                  !(t.contains(":") && t.indexOf(":") < t.indexOf(" - ")))
                delim = " - "
              val m = ReSearchSfsId.matcher(t)
              if (delim == ":" && m.find() && t.contains(":") &&
                  m.start() < t.indexOf(":"))
                delim = " "
              if (t.contains(delim))
                term = Some(t.split(Pattern.quote(delim))(0))
            }
            val m2 = ReBrottsdef.matcher(t)
            if (m2.find()) term = Some(m2.group(2))
            val m3 = ReBrottsdefAlt.matcher(t)
            if (m3.find()) term = Some(m3.group(1))
            val m4 = ReParantesdef.matcher(t)
            if (m4.find()) term = Some(m4.group(1))
            val m5 = ReLoptextdef.matcher(t)
            if (m5.find()) term = Some(m5.group(1))
          }
        } else { // Listelement
          firstStr(n).foreach { t0 =>
            var t = t0
            Seq(ReBullet, ReDottedNumber, ReBokstavslista).foreach { rx =>
              t = rx.matcher(t).replaceFirst("")
            }
            term = Some(t.split(":")(0))
          }
        }
        term = term.filter(_.length < 68).map(normSpace)
      }

      term match {
        case Some(tm) =>
          // a found term stops definition-finding for the SUBTREE
          // (find_definitions_recursive = False, sfs.py:1343-1346)
          val marked =
            if (splitTarget >= 0)
              n.copy(children = n.children.updated(splitTarget,
                splitIn(n.children(splitTarget), tm)))
            else splitIn(n, tm)
          marked.copy(children = marked.children.map(walk(_, None)))
        case None =>
          n.copy(children = n.children.map(walk(_, fd)))
      }
    }
    walk(root, None)
  }

  // ------------------------------------------------- citation marking
  /** parse_recursive skip set (swedishlegalsource.py:1622-1631) — the
    * members that exist in the SFS element tree. */
  private val CiteSkip = Set("Rubrik", "UpphavtKapitel", "UpphavdParagraf",
    "LinkSubject", "Link")

  private val IdFrag = Pattern.compile(
    "(K([a-z0-9]+))?(P([a-z0-9]+))?(S(\\d+))?(N(\\d+))?.*")

  /** Run the LAGRUM grammar over every text span, with the enclosing
    * element's chapter/section as relative-reference context (the
    * reference's _currenturl → re_urisegments attributes,
    * swedishlegalsource.py:1655-1668). One parser instance per document
    * so the anaphoric lastLaw state carries across paragraphs exactly
    * like the reference's cached lagrum_parser. */
  def markCitations(root: TreeNode, basefile: String,
                    namedLaws: Map[String, String],
                    base: String = HarnessBase): TreeNode = {
    val parser = new LawRef.Parser(LawRef.Conf(
      base = base + "/", namedLaws = namedLaws))
    // the reference's lagrum_parser is LegalRef(LAGRUM, EULAGSTIFTNING)
    // (sfs.py:183-187): EU-act citations link too — scan the spans the
    // LAGRUM grammar left plain with the EU grammar
    val euParser = new EuActRef.Parser(EuActRef.Conf(base = base + "/"))

    // _currenturl is DOCUMENT-ORDER state, not lexically scoped
    // (parse_recursive mutates it while descending and never restores):
    // before the first id-carrying node — in particular inside a
    // not-in-effect temporal element that got no URI — there is no law
    // context, and relative references cannot mint (the reference's
    // temporal-table goldens keep "23 kap. 1 §" plain inside the
    // expired paragraph version, linked inside the in-force one).
    var cururl: Option[(Option[String], Option[String])] = None

    def updateCtx(id: String): Unit = {
      val m = IdFrag.matcher(id)
      cururl = Some(
        if (m.matches()) (Option(m.group(2)), Option(m.group(4)))
        else (None, None))
    }

    def parseStr(text: String): Vector[TreeNode] = {
      val (chapter, section) = cururl.getOrElse((None, None))
      parser.setContext(chapter, section)
      parser.parse(text, cururl.map(_ => basefile)).flatMap { seg =>
        seg.uri match {
          case Some(u) => Vector(TreeNode("LinkSubject",
            Vector("predicate" -> "dcterms:references", "uri" -> u),
            text = Some(seg.text)))
          case None => euParser.parse(seg.text).map { es =>
            es.uri match {
              case Some(u) => TreeNode("LinkSubject",
                Vector("predicate" -> "dcterms:references", "uri" -> u),
                text = Some(es.text))
              case None => TreeNode.str(es.text)
            }
          }
        }
      }
    }

    def walk(n: TreeNode): TreeNode = {
      n.attr("id").foreach(updateCtx)
      n.copy(children = n.children.flatMap { c =>
        if (CiteSkip(c.tag)) Vector(c)
        else if (c.tag == "str") parseStr(c.text.getOrElse(""))
        else if (c.text.isDefined && c.children.isEmpty) Vector(c)
        else Vector(walk(c))
      })
    }
    walk(root)
  }

  /** The full post-parse pipeline in the harness's order
    * (integrationSFS.py:51-55). */
  def markup(tree: TreeNode, basefile: String,
             namedLaws: Map[String, String],
             base: String = HarnessBase): TreeNode =
    markCitations(findDefinitions(constructIds(tree, basefile, base)),
      basefile, namedLaws, base)
}
