package graft.pdf

import java.util.regex.Pattern
import graft.parse.{OfftryckGlue, OfftryckParser, PdfReader, TreeNode}
import graft.parse.OfftryckParser.{BoxTok, Metrics, OTok, PageTok, Style}
import graft.parse.PdfReader.{PdfDoc, PdfPage, Textbox}
import graft.functions.Selectors

/** End-to-end offtryck document assembly: pdf2xml/hOCR intermediate →
  * PdfReader → PropAnalyzer segmentation → pagination → per-segment
  * offtryck FSM parse → one body tree.
  *
  * This is the reference's Offtryck.parse_body driver
  * (/root/reference/ferenda/sources/legal/se/offtryck.py:378-536) plus
  * paginate (:554-597) and the Riksdagen scanned-source sanitation
  * (riksdagen.py:383-420), minus the download/HTTP plumbing (the
  * sandbox input IS the intermediate artifact).
  */
object OfftryckDoc {

  final case class Source(
      content: String,
      hocr: Boolean,
      fontinfo: Map[String, String],
      basefile: String,   // "2017/18:86"
      identifier: String, // "Prop. 2017/18:86"
      baseuri: String,    // "https://lagen.nu/prop/2017/18:86"
      srcName: String,    // pdf basename used in pagemapping keys
      metricsJson: Option[String] = None,
      pagemappingJson: Option[String] = None,
      /** regeringen.py:696-698 alternate_decoders — (Prop, 1997/98:44)
        * uses OffsetDecoder20("Datalagskommittén"). */
      decoder20Key: Option[String] = None,
      preset: String = "proposition",
      parseconfig: String = "default",
      /** When set, the find_commentary/find_primary_law visitor pass
        * runs per main segment with this statute-citation config (the
        * named-law dictionary plays the reference's commondata role). */
      commentary: Option[graft.parse.LawRef.Conf] = None)

  // ------------------------------------------------------------ reading
  def read(src: Source): PdfDoc =
    if (src.hocr) PdfReader.parseHocr(src.content)
    else {
      val dec = src.decoder20Key match {
        case Some(k) => new graft.parse.PdfDecoders.OffsetDecoder20(Some(k))
        case None => new graft.parse.PdfDecoders.DetectingDecoder
      }
      PdfReader.parseXml(src.content, src.fontinfo, dec)
    }

  /** riksdagen.py:383-420 scanned-source sanitation: drop probable OCR
    * mistakes after suspicious gaps on the front page; move late
    * "Bilaga n" margin boxes to the page start. */
  def sanitizeScanned(pdf: PdfDoc): PdfDoc = {
    val pages = pdf.pages.zipWithIndex.map { case (page, pageidx) =>
      var boxes = page.boxes
      if (pageidx == 0) {
        val pagewidth = page.width
        boxes = boxes.map { tb =>
          var prevright = 0
          val kept = tb.els.filter { el =>
            val left = el.geom.map(_.left).getOrElse(0)
            val width = el.geom.map(_.width).getOrElse(0)
            val drop = prevright > 0 &&
              (left - prevright > pagewidth / 20) &&
              OfftryckParser.pyStrip(el.text).length < 4
            if (!drop) prevright = left + width
            // NB: the reference updates prevright from the element even
            // when it keeps it; a dropped element does not move the edge
            drop == false
          }
          tb.copy(els = kept)
        }.filter(_.els.nonEmpty)
      }
      if (boxes.length > 2) {
        val moveIdx = Seq(boxes.length - 1, boxes.length - 2).find { i =>
          boxes(i).left > page.width * 0.6 &&
          Pattern.compile("Bilaga [l\\d]").matcher(boxes(i).text).find()
        }
        moveIdx.foreach { i => boxes = boxes(i) +: boxes.patch(i, Nil, 1) }
      }
      page.copy(boxes = boxes)
    }
    pdf.copy(pages = pages)
  }

  // --------------------------------------------------------- pagination
  /** offtryck.py:554-597 paginate: printed page labels per physical
    * page index (cached mapping wins; otherwise the analyzer guesses
    * with pagination_min_size raised above the footnoteref size). */
  def paginate(pdf: PdfDoc, analyzer: PdfAnalyzer, src: Source)
      : Map[Int, String] = {
    val mapping: Seq[(String, String)] = src.pagemappingJson match {
      case Some(json) => parseJsonMap(json)
      case None =>
        val styles = analyzer.analyzeStyles(
          analyzer.countStyles(0, pdf.pages.length))
        styles.get("footnoteref").foreach { case (_, size) =>
          analyzer.paginationMinSize = size + 1 }
        analyzer.paginate(src.srcName).map { case (k, v) =>
          (k, v.fold(_.toString, identity)) }
    }
    val filemapping = pdf.pages.zipWithIndex.map { case (p, idx) =>
      (s"${src.srcName}#page=${p.number}", idx) }.toMap
    mapping.flatMap { case (k, v) =>
      filemapping.get(k).map(_ -> v) }.toMap
  }

  /** Minimal flat JSON object reader for the cached
    * .pagemapping.json / .metrics.json artifacts (string or numeric or
    * nested {family,size} values; no arrays, no escapes beyond \"). */
  def parseJsonMap(json: String): Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val m = Pattern.compile(
      "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|-?\\d+(?:\\.\\d+)?|true|false|\\{[^}]*\\})")
      .matcher(json)
    while (m.find()) {
      val k = m.group(1).replace("\\\"", "\"")
      val v0 = m.group(2)
      val v = if (v0.startsWith("\""))
        v0.substring(1, v0.length - 1).replace("\\\"", "\"")
      else v0
      out += ((k, v))
    }
    out.result()
  }

  /** Build Metrics from a cached index.metrics.json. */
  def metricsFromJson(json: String): Metrics = {
    val kv = parseJsonMap(json).toMap
    def int(k: String): Option[Int] = kv.get(k).flatMap(_.toIntOption)
    def style(k: String): Option[Style] = kv.get(k).flatMap { obj =>
      val fam = Pattern.compile("\"family\"\\s*:\\s*\"([^\"]*)\"").matcher(obj)
      val size = Pattern.compile("\"size\"\\s*:\\s*(\\d+)").matcher(obj)
      if (fam.find() && size.find()) Some(Style(fam.group(1), size.group(1).toInt))
      else None
    }
    val d = Metrics()
    Metrics(
      leftmargin = int("leftmargin").getOrElse(d.leftmargin),
      rightmargin = int("rightmargin").getOrElse(d.rightmargin),
      leftmarginEven = int("leftmargin_even").getOrElse(d.leftmarginEven),
      rightmarginEven = int("rightmargin_even").getOrElse(d.rightmarginEven),
      topmargin = int("topmargin").getOrElse(d.topmargin),
      bottommargin = int("bottommargin").getOrElse(d.bottommargin),
      pageheight = int("pageheight").getOrElse(d.pageheight),
      pagewidth = int("pagewidth").getOrElse(d.pagewidth),
      h1 = style("h1").getOrElse(d.h1),
      h2 = style("h2").getOrElse(d.h2),
      h3 = style("h3").getOrElse(d.h3),
      default = style("default").getOrElse(d.default),
      footnoteref = style("footnoteref"),
      scannedSource = kv.get("scanned_source").contains("true"))
  }

  // ------------------------------------------------------------- tokens
  /** textboxes(gluefunc, pageobjects=True, startpage, pagecount)
    * (pdfreader.py:961-1024): Page token, then its glued boxes. */
  def tokens(pdf: PdfDoc, startpage: Int, pagecount: Int,
             printed: Map[Int, String], baseuri: String,
             srcName: String,
             glueVerdict: (Textbox, Textbox, Textbox) => Int)
      : Iterator[OTok] = {
    import graft.parse.OfftryckGlue.{GlueNewLine, GlueParid, NoGlue}
    pdf.pages.slice(startpage, startpage + pagecount).zipWithIndex
      .iterator.flatMap { case (page, rel) =>
        val idx = startpage + rel
        val (number, pngSrc) = printed.get(idx) match {
          case Some(v) => (v, s"$baseuri/sid$v.png")
          case None => (page.number.toString, srcName)
        }
        val pageTok: OTok =
          PageTok(number, page.width, page.height, pngSrc)
        val glued = Vector.newBuilder[OTok]
        var textbox: Option[Textbox] = None
        var prevbox: Option[Textbox] = None
        page.boxes.foreach { nextbox =>
          if (nextbox.text.trim.nonEmpty) {
            textbox match {
              case None => textbox = Some(nextbox)
              case Some(tb0) =>
                // the reference's gluefunc line bookkeeping
                // (offtryck.py:247-255, 371-373), applied from the
                // reported verdict since our boxes are immutable
                var tb = if (tb0.lines < 1)
                  tb0.copy(lines = 1, lineheight = tb0.height) else tb0
                val v = glueVerdict(tb, nextbox, prevbox.getOrElse(tb))
                if (v != NoGlue) {
                  if (v == GlueNewLine) {
                    val nl = tb.lines + 1
                    tb = tb.copy(lines = nl, lineheight =
                      ((nl - 1) * tb.lineheight + nextbox.height) / nl)
                  } else if (v == GlueParid) {
                    val nl = tb.lines + 1
                    // the reference's own uncorrected precedence:
                    // (lines - 1 * lineheight) + height, offtryck.py:255
                    tb = tb.copy(lines = nl, lineheight =
                      ((nl - 1 * tb.lineheight) + nextbox.height) / nl)
                  }
                  textbox = Some(tb + nextbox)
                } else { glued += BoxTok(tb); textbox = Some(nextbox) }
            }
            prevbox = Some(nextbox)
          }
        }
        textbox.foreach(b => glued += BoxTok(b))
        Iterator.single(pageTok) ++ glued.result().iterator
      }
  }

  // ------------------------------------------------------------ parsing
  private def increment(s: String, by: Int): String =
    s.toIntOption match {
      case Some(i) => (i + by).toString
      case None => // roman numeral (util.increment, util.py:715-725)
        Selectors.toRoman(Selectors.fromRoman(s.toUpperCase) + by)
          .toLowerCase
    }

  private def lastSidbrytning(n: TreeNode): Option[String] = {
    if (n.tag == "Sidbrytning") return n.attr("ordinal")
    n.children.reverseIterator.flatMap(lastSidbrytning).nextOption()
  }

  /** The parse_body driver: segment → paginate → per-segment FSM. */
  def parse(src: Source): TreeNode = {
    var pdf = read(src)
    val scanned = src.hocr
    if (scanned) pdf = sanitizeScanned(pdf)
    val glue = OfftryckGlue.verdict(pdf.fontspec, scanned)
    // get_pdf_analyzer (offtryck.py:969-986): doctype-specific
    // segmentation/metrics; parse_body hands the SOU/Ds analyzers the
    // gluefunc for their titleish probes (offtryck.py:421-424)
    val glueBool = OfftryckGlue.gluefunc(pdf.fontspec, scanned)
    val analyzer: PdfAnalyzer = src.preset match {
      case "proposition" => new PropAnalyzer(pdf, scanned)
      case "sou" => new SouAnalyzer(pdf, scanned, Some(glueBool))
      case "ds" => new DsAnalyzer(pdf, scanned, Some(glueBool))
      case "dir" => new DirAnalyzer(pdf, scanned)
      case _ => new PdfAnalyzer(pdf, scannedSource = scanned)
    }
    val printed = paginate(pdf, analyzer, src)

    def metricsFor(startpage: Int, pagecount: Int): Metrics =
      src.metricsJson.map(metricsFromJson).getOrElse {
        val (ints, styles, sc) = analyzer.metrics(startpage, pagecount)
        Metrics.fromMaps(ints, styles, sc)
      }

    var body = TreeNode("Body")
    var pageno = "1"
    analyzer.documents.foreach { case (startpage, pagecount, tag) =>
      if (tag == "main") {
        pageno = increment(pageno, -1) // offtryck.py:425 "argh...."
        val metrics = metricsFor(startpage, pagecount)
        val parser = new OfftryckParser(src.basefile, metrics, src.preset,
          src.identifier, pdf.fontspec,
          initialPageno = pageno.toIntOption.getOrElse(0),
          parseconfig = src.parseconfig)
        val segBody0 = parser.parse(tokens(pdf, startpage, pagecount,
          printed, src.baseuri, src.srcName, glue))
        // visitor pass (offtryck.py:437-441): commentary detection per
        // segment, with a fresh citation parser (the reference clears
        // currentlynamedlaws per visitor_functions call)
        val segBody = src.commentary match {
          case Some(lawConf) =>
            val oc = new graft.parse.OfftryckCommentary(src.basefile,
              new graft.parse.LawRef.Parser(lawConf), lawConf.base,
              metrics.default.size)
            oc(segBody0)
          case None => segBody0
        }
        segBody.children.foreach(c => body = body.appendChild(c))
        pageno = lastSidbrytning(segBody).map(increment(_, 1)).getOrElse("1")
      } else if (tag == "frontmatter" || tag == "endregister") {
        // cover pages, edition notices — skipped (offtryck.py:492-496)
        pageno = "1"
      } else {
        // appendix/eudok segments are copied verbatim (offtryck.py:497-510)
        var s = TreeNode("VerbatimSection")
        pdf.pages.slice(startpage, startpage + pagecount).zipWithIndex
          .foreach { case (page, relidx) =>
            val ord = increment(pageno, relidx)
            val pngSrc = printed.get(startpage + relidx)
              .map(v => s"${src.baseuri}/sid$v.png").getOrElse(src.srcName)
            s = s.appendChild(TreeNode("Sidbrytning", Vector(
              "ordinal" -> ord, "width" -> page.width.toString,
              "height" -> page.height.toString, "src" -> pngSrc)))
            page.boxes.foreach(b =>
              s = s.appendChild(OfftryckParser.boxNode(b, pdf.fontspec)))
          }
        body = body.appendChild(s)
        pageno = lastSidbrytning(s).map(increment(_, 1)).getOrElse("1")
      }
    }
    postprocess(body)
  }

  // ----------------------------------------------------------- skeleton
  /** Structural skeleton: one line per structural node, depth-indented,
    * with the URI fragment each node would be minted
    * (elements.py:482-657: #PS/#US/#PU document-order counters,
    * #S/#FF from the ordinal, #B from the appendix ordinal; Avsnitt
    * directly under a second/third Protokollsutdrag get NO fragment —
    * offtryck.py:720-743). The same skeleton is extracted from the
    * reference's parsed XHTML goldens for parity testing. */
  /** One structural row: (kind, fragment-or-'-', title, depth). */
  final case class StructRow(kind: String, frag: String, title: String,
                             depth: Int)

  def structure(body: TreeNode,
                withParagraphs: Boolean = false): Vector[StructRow] = {
    val out = Vector.newBuilder[StructRow]
    var ps = 0; var us = 0; var pu = 0
    def walk(n: TreeNode, depth: Int, noUri: Boolean): Unit = {
      def title = n.attr("title").getOrElse("")
      n.tag match {
        case "Forfattningskommentar" =>
          out += StructRow("kommentar",
            n.attr("comment_on").filter(_.nonEmpty).getOrElse("-"),
            n.attr("label").getOrElse(""), depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "Textbox" | "UnorderedList" if withParagraphs =>
          out += StructRow("p", "-",
            graft.parse.OfftryckParser.normalizeSpace(
              graft.parse.OfftryckCommentary.renderTextOf(n)), depth)
        case "FrontmatterSection" =>
          out += StructRow("frontmatter", "-", "", depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "PropHuvudrubrik" =>
          out += StructRow("prophuvudrubrik", "-", n.text.getOrElse(""),
            depth)
        case "PropRubrik" =>
          out += StructRow("proprubrik", "-", n.text.getOrElse(""), depth)
        case "PreambleSection" =>
          ps += 1
          out += StructRow("preamblesection", s"#PS$ps", title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "Avsnitt" =>
          val frag =
            if (noUri) "-"
            else "#S" + n.attr("ordinal").get.replace(".", "-")
          out += StructRow("section", frag, title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "Forfattningsforslag" =>
          val frag = n.attr("ordinal")
            .map(o => "#FF" + o.replace(".", "-")).getOrElse("-")
          out += StructRow("section", frag, title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "PseudoSection" =>
          out += StructRow("pseudosection", "-", title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "UnorderedSection" =>
          us += 1
          out += StructRow("unorderedsection", s"#US$us", title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "Protokollsutdrag" =>
          pu += 1
          out += StructRow("protokollsutdrag", s"#PU$pu", title, depth)
          // only the FIRST protokollsutdrag's sections get URIs
          n.children.foreach(walk(_, depth + 1, noUri = pu > 1))
        case "Appendix" =>
          out += StructRow("appendix", s"#B${n.attr("ordinal").get}",
            title, depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "VerbatimSection" =>
          out += StructRow("verbatim", "-", "", depth)
          n.children.foreach(walk(_, depth + 1, noUri))
        case "Sidbrytning" =>
          out += StructRow("sid", "-", n.attr("ordinal").getOrElse(""),
            depth)
        case _ => // textboxes, lists: not structural — and a pagebreak
          // can never hide inside them, so no recursion needed
          ()
      }
    }
    body.children.foreach(walk(_, 0, noUri = false))
    out.result()
  }

  def skeleton(body: TreeNode): Vector[String] =
    structure(body).map { r =>
      val pad = "  " * r.depth
      r.kind match {
        case "frontmatter" | "verbatim" => s"$pad${r.kind}"
        case "sid" => s"${pad}sid ${r.title}"
        case "prophuvudrubrik" | "proprubrik" | "pseudosection" =>
          s"$pad${r.kind} '${r.title}'"
        case k => s"$pad$k ${r.frag} '${r.title}'"
      }
    }

  /** postprocess_doc for propositions (offtryck.py:648-660): the first
    * pagebreak moves inside the following FrontmatterSection. */
  def postprocess(body: TreeNode): TreeNode = {
    val kids = body.children
    if (kids.length >= 2 && kids(0).tag == "Sidbrytning" &&
        kids(1).tag == "FrontmatterSection") {
      val fm = kids(1).copy(children = kids(0) +: kids(1).children)
      body.copy(children = fm +: kids.drop(2))
    } else body
  }
}
