package graft.parse

import java.util.regex.Pattern
import graft.parse.OfftryckParser.{normalizeSpace, pyStrip}

/** Författningskommentar detection and markup — the reference's
  * CommentaryFinder + find_commentary/find_primary_law visitors
  * (/root/reference/ferenda/sources/legal/se/offtryck.py:653-1008,
  * 1008-1479): inside a proposition's "Författningskommentar" chapter,
  * classify each paragraph as quoted ACT TEXT or COMMENT on a statute
  * part, using a pseudo-KDE threshold over the document's observed
  * linespacings and inter-paragraph gaps, and wrap the comments in
  * Forfattningskommentar nodes anchored to the commented statute part
  * (#kommentar-<law>/<frag> sub-resources).
  *
  * Runs on the FSM's output TreeNode per document — pure JVM, one doc
  * per row. */
final class OfftryckCommentary(
    basefile: String,
    lawParser: LawRef.Parser,
    /** SFS-space base for temp URIs of not-yet-enacted laws
      * (swedishlegalsource.py:1552-1578). */
    sfsBase: String,
    defaultsize: Int,
    debugLog: StringBuilder = new StringBuilder) {

  import OfftryckCommentary._

  // ------------------------------------------------- _parse_uri_from_text
  /** offtryck.py:1008 re_urisegments. */
  private val ReUriSegments = Pattern.compile(
    "([\\w]+://[^/]+/[^\\d]*)(\\d+:(bih\\.[_ ]|N|)?\\d+([_ ]s\\.\\d+|))#?" +
    "(K([a-z0-9]+)|)(P([a-z0-9]+)|)(S(\\d+)|)(N(\\d+)|)")

  /** offtryck.py:931-967: the first statute link in `text`, resolved
    * against the base-uri attributes. */
  def parseUriFromText(text0: String, baseuri: String = ""): Option[String] = {
    val text = text0.replaceAll("(\\d+)(§)", "$1 §")
    val m = ReUriSegments.matcher(baseuri)
    val (law, chapter, section) =
      if (m.lookingAt())
        (Some(m.group(2)), Option(m.group(6)).filter(_ != null),
          Option(m.group(8)))
      else (None, None, None)
    lawParser.setContext(chapter.filter(_.nonEmpty),
      section.filter(_.nonEmpty))
    val segs =
      try lawParser.parse(text, law.orElse(None))
      finally lawParser.setContext(None, None)
    segs.collectFirst { case s if s.uri.isDefined => s.uri.get }
  }

  /** temp_sfs_uri (swedishlegalsource.py:1552-1578): SFS 0000:<base27>
    * for laws that have no number yet. */
  def tempSfsUri(lawname: String): String = {
    var slug = lawname.replaceAll("[^\\p{L}\\p{N}_]+", "").toLowerCase
    slug = slug.replaceAll("\\d+", "")
    slug = slug.replace("å", "aa").replace("ä", "ae").replace("ö", "oe")
      .replace("é", "e").replace("æ", "a")
    val alphabet = " abcdefghijklmnopqrstuvwxyz"
    val num = slug.foldLeft(BigInt(0)) { (acc, c) =>
      val d = alphabet.indexOf(c)
      require(d >= 0, s"unsluggable char '$c' in $lawname")
      acc * 27 + d
    }
    s"$sfsBase0000:$num"
  }
  private def sfsBase0000: String = s"${sfsBase}0000"

  // -------------------------------------------------------- identify_law
  /** CommentaryFinder.is_commentary_section (offtryck.py:1017-1019). */
  def isCommentarySection(n: TreeNode): Boolean =
    n.attr("title").exists(t =>
      Pattern.compile("Förslag(|et) (till lag om|om lag till) ändring i")
        .matcher(t).lookingAt() ||
      Pattern.compile("Förslag(|et) till").matcher(t).lookingAt())

  /** CommentaryFinder.identify_law (offtryck.py:1021-1036). */
  def identifyLaw(title: String): (Option[String], String) =
    if (title.contains("ändring i")) {
      val lawname = title.split(" ", 7).last
      (parseUriFromText(title), lawname)
    } else {
      val lawname = title.split(" ", 3).last
      (Some(tempSfsUri(lawname)), lawname)
    }

  // ------------------------------------------------------ KDE thresholds
  /** estimate_density (offtryck.py:1075-1100): discrete high-res bins
    * smoothed with a gaussian kernel. */
  def estimateDensity(series: Seq[Double], resolution: Int,
                      bandwidth: Int): (Array[Double], Array[Double]) = {
    val start = series.min
    val stop = series.max
    val width = stop - start
    val bins = new Array[Double](resolution + bandwidth)
    val scale = new Array[Double](resolution + bandwidth)
    val s = bandwidth / 10.0
    val kernelrange = ((-bandwidth / 2) + 1) to (bandwidth / 2)
    val kernel = kernelrange.map(x =>
      1.0 / (math.sqrt(2 * math.Pi) * s) *
        math.exp(-0.5 * math.pow(x.toDouble / s, 2))).toArray
    series.foreach { v =>
      val fraction = (v - start) / width
      val binidx = math.floor(fraction * resolution).toInt + bandwidth / 2
      kernelrange.zipWithIndex.foreach { case (offset, kernidx) =>
        bins(binidx + offset - 1) += kernel(kernidx)
      }
    }
    bins.indices.foreach { idx =>
      scale(idx) = (idx - bandwidth / 2).toDouble / resolution * width + start
    }
    (bins, scale)
  }

  /** threshold (offtryck.py:1102-1130): the valley after the first
    * significant peak. */
  def threshold(series: Seq[Double], resolution: Int = 1000,
                bandwidth: Int = 200): Double = {
    require(series.nonEmpty,
      "Impossible to calculate a KDE threshold for an empty series")
    if (series.length == 1) return series.head
    val (bins, scale) = estimateDensity(series, resolution, bandwidth)
    val minpeak = bins.max * 0.25
    var peak = false
    var best = 0.0
    var idx = 0
    var broke = false
    while (idx < bins.length && !broke) {
      val v = bins(idx)
      if (!peak) {
        if (v >= best) best = v
        else if (v >= minpeak) peak = true
      } else {
        if (v <= best) best = v
        else broke = true
      }
      if (!broke) idx += 1
    }
    if (!broke) idx = bins.length - 1 // loop exhausted (py for-else shape)
    scale(idx - 1)
  }

  /** collect_features (offtryck.py:1114-1144, detect_singleline off). */
  def collectFeatures(commentaries: Seq[TreeNode])
      : (Vector[Double], Vector[Double]) = {
    val linespacings = Vector.newBuilder[Double]
    val gaps = Vector.newBuilder[Double]
    var prevnode: Option[TreeNode] = None
    commentaries.foreach { section =>
      section.children.zipWithIndex.foreach { case (subnode, idx) =>
        if (subnode.tag != "Sidbrytning") {
          OfftryckParser.linespacingOf(subnode)
            .filter(_ != 0.0).foreach(linespacings += _)
          val top = subnode.attr("top").flatMap(_.toIntOption)
          val prevBottom = prevnode.flatMap(_.attr("bottom"))
            .flatMap(_.toIntOption)
            .orElse(prevnode.flatMap(b => (for {
              t <- b.attr("top"); h <- b.attr("height")
            } yield t.toInt + h.toInt)))
          if (idx > 0)
            for (t <- top; pb <- prevBottom; if t > pb)
              gaps += (t - pb).toDouble
          prevnode = Some(subnode)
        }
      }
    }
    (linespacings.result(), gaps.result())
  }

  /** analyze (offtryck.py:1146-1172): thresholds + the 20%-spread rule. */
  def analyze(commentaries: Seq[TreeNode]): Thresholds = {
    val (linespacings, gaps) = collectFeatures(commentaries)
    val gapThreshold = threshold(gaps, resolution = 1000, bandwidth = 400)
    val maxLs = linespacings.max
    val minLs = linespacings.min
    val lsThreshold =
      if ((maxLs - minLs) / minLs < 0.20) minLs
      else threshold(linespacings, resolution = 1000, bandwidth = 500)
    Thresholds(lsThreshold, gapThreshold, defaultsize)
  }

  // --------------------------------------------- the commentary FSM
  /** make_commentary_parser (offtryck.py:1177-1475) over the section's
    * child nodes. Returns the replacement child sequence. */
  def markupCommentary(section: TreeNode, lawUri: String, lawName: String,
                       metrics: Thresholds): TreeNode = {
    import FsmParser.{Config, Constructor, Recognizer, Transition}
    type P = FsmParser[TreeNode]

    var assume: Option[String] = Some("comment")
    var commentOn: Option[String] = None
    var beginning = true
    var skipheader = false
    var reftext: Option[String] = None
    var law = lawUri

    def text(n: TreeNode): String = textOf(n)
    def sizeOf(n: TreeNode): Int =
      n.attr("size").flatMap(_.toIntOption).getOrElse(0)
    def topOf(n: TreeNode): Int =
      n.attr("top").flatMap(_.toIntOption).getOrElse(0)
    def bottomOf(n: TreeNode): Int =
      n.attr("bottom").flatMap(_.toIntOption).getOrElse(
        topOf(n) + n.attr("height").flatMap(_.toIntOption).getOrElse(0))
    def linesOf(n: TreeNode): Int =
      n.attr("lines").flatMap(_.toIntOption).getOrElse(0)

    // tristate helpers (offtryck.py:1383-1437)
    def probableHeader(n: TreeNode): Boolean = {
      val t = pyStrip(text(n))
      if (t == "Bestämmelse Kommentarerna finns i avsnitt") return false
      (t.length < 100 &&
        !t.endsWith(")") && !t.endsWith(" i") && !t.endsWith(" §") &&
        !t.endsWith(".")) || t.endsWith(" m.m.") || t.endsWith(" m.fl.")
    }

    def probableComment(n: TreeNode): Option[Boolean] = {
      val t = pyStrip(text(n))
      if (Pattern.compile(
          "(Av p|P)aragrafen (framgår|innehåller|har behandlats|är ny|, som är ny|avgränsar|innebär)")
          .matcher(t).lookingAt()) Some(true)
      else if (Pattern.compile("I första stycket").matcher(t).lookingAt())
        Some(true)
      else if (Pattern.compile("\\((Jfr|Paragrafen)").matcher(t)
          .lookingAt()) Some(true)
      else if (metrics.defaultsize >= sizeOf(n) + 2) Some(false)
      else if (linesOf(n) > 1)
        Some(metrics.linespacingThreshold != 0.0 &&
          OfftryckParser.linespacingOf(n).exists(ls =>
            ls != 0.0 && ls >= metrics.linespacingThreshold))
      else None
    }

    def probableActtext(n: TreeNode): Option[Boolean] = {
      if (n.tag == "Sidbrytning") return None
      if (metrics.defaultsize >= sizeOf(n) + 2) Some(true)
      else if (linesOf(n) > 1)
        Some(metrics.linespacingThreshold != 0.0 &&
          OfftryckParser.linespacingOf(n).exists(ls =>
            ls != 0.0 && ls < metrics.linespacingThreshold))
      else None
    }

    // recognizers (offtryck.py:1181-1240)
    def peek(p: P, n: Int = 1): TreeNode = p.reader.peek(n)
    def isChapterHeader(p: P): Boolean = {
      val t = pyStrip(text(peek(p)))
      (t.length < 20 && (t.endsWith(" kap.") || t.endsWith(" kap"))) ||
        Pattern.compile("\\d+( \\w|)\\s[Kk]ap. +[^\\d]").matcher(t)
          .lookingAt()
    }
    def isSectionHeader(p: P): Boolean = {
      val t = pyStrip(text(peek(p)))
      t.length < 20 && t.endsWith("§")
    }
    def isSectionStart(p: P): Boolean =
      Pattern.compile("\\d+(| \\w) § +[A-ZÅÄÖ]")
        .matcher(pyStrip(text(peek(p)))).lookingAt()
    def isTransitionRegs(p: P): Boolean =
      Set("Ikraftträdande- och övergångsbestämmelse",
        "Ikraftträdande- och övergångsbestämmelser",
        // NB: the reference tuple is missing a comma here, so these two
        // strings CONCATENATE — ported faithfully
        "IkraftträdandebestämmelserÖvergångsbestämmelser")
        .contains(pyStrip(text(peek(p))))
    def isHeader(p: P): Boolean = probableHeader(peek(p))
    def isComment(p: P): Boolean = probableComment(peek(p)) match {
      case Some(b) => b
      case None =>
        if (assume.isEmpty) {
          val two = p.reader.peekOpt(2)
          val gapOk = two.exists(t => t.tag != "Sidbrytning" &&
            topOf(t) - bottomOf(peek(p)) < metrics.gapThreshold)
          if (gapOk && two.exists(t => probableComment(t).contains(true)))
            true
          else assume.contains("comment")
        } else assume.contains("comment")
    }
    def isActtext(p: P): Boolean = probableActtext(peek(p)) match {
      case Some(b) => b
      case None => assume.contains("acttext")
    }
    def isPagebreak(p: P): Boolean = {
      val n = peek(p)
      require(n.tag == "Textbox" || n.tag == "Sidbrytning" ||
        n.tag == "UnorderedList",
        s"Got a ${n.tag} instead of a Textbox/Sidbrytning/UnorderedList," +
        " this indicates broken parsing")
      n.tag == "Sidbrytning"
    }

    // constructors (offtryck.py:1242-1380)
    def makeParagraphBody(p: P): TreeNode = {
      val ret = p.reader.next()
      p.reader.peekOpt() match {
        case Some(next)
            if next.tag != "Sidbrytning" &&
              topOf(next) - bottomOf(ret) > metrics.gapThreshold =>
          if (assume.contains("acttext")) assume = Some("comment")
        case _ => ()
      }
      ret
    }

    def makeSectionBody(p: P): TreeNode = {
      val t = text(peek(p))
      val rt = t.substring(0, t.indexOf("§") + 1)
      reftext = Some(rt)
      commentOn = parseUriFromText(rt, law)
      makeParagraphBody(p)
    }

    val makeComment = Constructor[TreeNode]("make_comment",
      pushesState = true, p => {
        assume = Some("comment")
        val t = text(peek(p))
        var label: String = null
        if (commentOn.isEmpty) {
          if (beginning) {
            // the ORIGINAL section law, not the chapter-mutated one
            // (make_comment closes over the lawuri argument,
            // offtryck.py:1252-1254)
            commentOn = Some(lawUri)
            beginning = false
            label = s"Författningskommentar till $lawName"
          } else {
            debugLog.append(s"$basefile: Creating un-anchored comment " +
              s"'${t.take(40)}...'\n")
            label = s"Författningskommentar i $lawName"
          }
        } else {
          label = s"Författningskommentar till ${reftext.getOrElse("")} " +
            lawName
        }
        val title = if (skipheader) reftext.getOrElse("") else ""
        val attrs = Vector("title" -> title,
          "comment_on" -> commentOn.getOrElse(""), "label" -> label)
        val f = TreeNode("Forfattningskommentar", attrs,
          children = Vector(makeParagraphBody(p)))
        val comment = p.makeChildren(f)
        commentOn = None
        reftext = None
        skipheader = false
        Some(comment)
      })

    val makeActtext = Constructor[TreeNode]("make_acttext",
      pushesState = false, p => {
        assume = Some("acttext"); Some(makeParagraphBody(p)) })

    val makeHeader = Constructor[TreeNode]("make_header",
      pushesState = false, p => {
        assume = Some("acttext"); Some(makeParagraphBody(p)) })

    val makeParagraph = Constructor[TreeNode]("make_paragraph",
      pushesState = false, p => Some(makeParagraphBody(p)))

    val handlePagebreak = Constructor[TreeNode]("handle_pagebreak",
      pushesState = false, p => {
        val pagebreak = p.reader.next()
        assume = p.reader.peekOpt() match {
          case Some(nb) if nb.tag != "Sidbrytning" =>
            if (probableActtext(nb).contains(true)) Some("acttext")
            else if (probableComment(nb).contains(true)) Some("comment")
            else None
          case _ => None
        }
        Some(pagebreak)
      })

    val setupTransitionHeader = Constructor[TreeNode](
      "setup_transition_header", pushesState = false, p => {
        commentOn = Some(law.split("#")(0) + "#L")
        reftext = Some(pyStrip(text(p.reader.next())))
        skipheader = true
        None
      })

    val setupSectionHeader = Constructor[TreeNode]("setup_section_header",
      pushesState = false, p => {
        var idx = 2
        var prevbox: Option[TreeNode] = None
        var acttext: Option[Boolean] = None
        var done = false
        while (!done) {
          p.reader.peekOpt(idx) match {
            case None => done = true
            case Some(box) =>
              if (box.tag == "Sidbrytning" || prevbox.exists(pb =>
                  topOf(box) - bottomOf(pb) > metrics.gapThreshold))
                done = true
              else {
                acttext = probableActtext(box)
                if (acttext.isDefined) done = true
                else { prevbox = Some(box); idx += 1 }
              }
          }
        }
        if (acttext.contains(true)) {
          val ret = makeSectionBody(p)
          assume = Some("acttext")
          skipheader = false
          Some(ret)
        } else {
          makeSectionBody(p) // consume + discard the header line
          assume = Some("comment")
          skipheader = true
          None
        }
      })

    val setupSectionStart = Constructor[TreeNode]("setup_section_start",
      pushesState = false, p => {
        assume = Some("acttext")
        skipheader = false
        Some(makeSectionBody(p))
      })

    val setupChapterStart = Constructor[TreeNode]("setup_chapter_start",
      pushesState = false, p => {
        val t = text(peek(p))
        parseUriFromText(t, law).foreach { newlaw =>
          law = newlaw
          commentOn = Some(law)
        }
        skipheader = true
        reftext = Some(t)
        Some(p.reader.next())
      })

    val makeBody = Constructor[TreeNode]("make_body", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Body"))))

    val recognizers = Vector(
      Recognizer[TreeNode]("is_pagebreak", isPagebreak),
      Recognizer[TreeNode]("is_chapter_header", isChapterHeader),
      Recognizer[TreeNode]("is_section_header", isSectionHeader),
      Recognizer[TreeNode]("is_section_start", isSectionStart),
      Recognizer[TreeNode]("is_transition_regs", isTransitionRegs),
      Recognizer[TreeNode]("is_header", isHeader),
      Recognizer[TreeNode]("is_comment", isComment),
      Recognizer[TreeNode]("is_acttext", isActtext),
      Recognizer[TreeNode]("is_paragraph", _ => true))

    val F = None
    val t = Map.newBuilder[(String, String), Transition[TreeNode]]
    def add(states: Seq[String], rec: String,
            ctor: Option[Constructor[TreeNode]], ns: Option[String]): Unit =
      states.foreach(st => t += ((st, rec) -> Transition[TreeNode](ctor, ns)))
    add(Seq("body", "comment"), "is_pagebreak", Some(handlePagebreak), None)
    add(Seq("body"), "is_header", Some(makeHeader), None)
    add(Seq("body"), "is_chapter_header", Some(setupChapterStart), None)
    add(Seq("body"), "is_section_header", Some(setupSectionHeader), None)
    add(Seq("body"), "is_section_start", Some(setupSectionStart), None)
    add(Seq("body"), "is_comment", Some(makeComment), Some("comment"))
    add(Seq("body"), "is_acttext", Some(makeActtext), None)
    add(Seq("body"), "is_transition_regs", Some(setupTransitionHeader), None)
    add(Seq("comment"), "is_section_start", F, None)
    add(Seq("comment"), "is_header", F, None)
    add(Seq("comment"), "is_chapter_header", F, None)
    add(Seq("comment"), "is_section_header", F, None)
    add(Seq("comment"), "is_acttext", F, None)
    add(Seq("comment"), "is_paragraph", Some(makeParagraph), None)

    val parsed = new FsmParser[TreeNode](
      Config(recognizers, t.result(), "body", makeBody),
      section.children.iterator).parse()
    section.copy(children = parsed.children)
  }

  // ------------------------------------------------------------ visitors
  /** find_primary_law (offtryck.py:980-991): the first top-level
    * "Förslag till lag om ändring i …" section names the primary law. */
  def findPrimaryLaw(body: TreeNode): Option[(String, String)] =
    body.children.iterator
      .filter(_.tag == "Avsnitt")
      .flatMap { n =>
        val title = n.attr("title").getOrElse("")
        if (Pattern.compile("Förslag(|et) till lag om ändring i")
            .matcher(title).lookingAt())
          parseUriFromText(title).map(u => (u, title))
        else None
      }
      .nextOption()

  /** find_commentary (offtryck.py:993-1006 + the visitor loop): locate
    * the Författningskommentar chapter, identify per-law commentary
    * sections, compute thresholds, mark up each. Returns the body with
    * the commentary sections rewritten. */
  def apply(body: TreeNode): TreeNode = {
    val primary = findPrimaryLaw(body)
    val chapterTitles = Set("Författningskommentar",
      "Författningskommentarer", "Specialmotivering")
    val kids = body.children.map { node =>
      if (node.tag == "Avsnitt" &&
          node.attr("title").exists(chapterTitles.contains)) {
        val subs = node.children.filter(isCommentarySection)
        val commentaries: Seq[(TreeNode, Option[String], String)] =
          if (subs.nonEmpty)
            subs.map { s =>
              val (uri, name) = identifyLaw(s.attr("title").get)
              (s, uri, name)
            }
          else primary match {
            case Some((uri, name)) => Seq((node, Some(uri), name))
            case None =>
              debugLog.append(s"$basefile: Författningskommentar does " +
                "not specify name of law and find_primary_law didn't " +
                "find it either\n")
              return body
          }
        val metrics = analyze(commentaries.map(_._1))
        if (subs.nonEmpty) {
          val marked = commentaries.map { case (s, uri, name) =>
            s -> tryMarkup(s, uri, name, metrics)
          }.toMap
          node.copy(children = node.children.map(c =>
            marked.getOrElse(c, c)))
        } else tryMarkup(node, commentaries.head._2,
          commentaries.head._3, metrics)
      } else node
    }
    body.copy(children = kids)
  }

  private def tryMarkup(section: TreeNode, uri: Option[String],
                        name: String, metrics: Thresholds): TreeNode =
    try markupCommentary(section, uri.getOrElse(""), name, metrics)
    catch {
      case e: IllegalStateException => // the reference's FSMStateError
        debugLog.append(s"$basefile: ${e.getMessage}\n")
        section
    }
}

object OfftryckCommentary {
  final case class Thresholds(linespacingThreshold: Double,
                              gapThreshold: Double, defaultsize: Int)

  def textOf(n: TreeNode): String =
    (n.text.toSeq ++ n.children.map(textOf)).mkString

  /** The RENDERED text of a textbox node — Textbox.as_xhtml merges
    * adjacent same-tag runs through Textelement.__add__
    * (pdfreader.py:1468-1497 + 1579-1618), which inserts a seam space
    * (unless one is present, or the left side ends with a hyphen/dash)
    * and dehyphenates '-' + lowercase. `str(textbox)` does NOT — the
    * FSM recognizers see the raw concatenation, the published document
    * the merged one. */
  def renderTextOf(n: TreeNode): String = n.tag match {
    case "Textbox" =>
      val sb = new StringBuilder
      var prevTag = ""
      n.children.foreach { c =>
        val t = c.text.getOrElse("")
        if (c.tag == prevTag && sb.nonEmpty) {
          // Textelement.__add__ seam
          if (sb.last == '-' && t.headOption.exists(_.isLower))
            sb.deleteCharAt(sb.length - 1) // dehyphenate
          else if (sb.last != ' ' && sb.last != '-' && !t.startsWith(" "))
            sb.append(' ')
        }
        sb.append(t)
        prevTag = c.tag
      }
      sb.toString
    case _ => textOf(n)
  }
}
