package graft.parse

import java.util.regex.Pattern
import graft.kg.EntityDict
import graft.model.{SourceFile, Triple, Vocab}
import graft.parse.PdfReader.Textbox

/** JO (parliamentary ombudsman) decision doctype — the reference's JO
  * repo (/root/reference/ferenda/sources/legal/se/jo.py:152-376): its
  * own tolerant glue, a geometry/style-driven FSM (17pt heading →
  * dcterms:title, the first dnr/date boxes → diarienummer /
  * avgorandedatum Meta nodes with one-shot recognizers, "Beslutet i
  * korthet:" abstract, 14pt-bold unordered sections, ≥255pt-indented
  * blockquotes, fixed header/footer bands), and the postprocess pass
  * that lifts Meta nodes into the document graph (the in-document
  * title REPLACES any headnote title; dcterms:issued falls back to the
  * decision date). */
object JoDoc {

  val AvgType: String = Vocab.rpubl("VagledandeMyndighetsavgorande")

  final case class Conf(
      baseUri: String = s"${EntityDict.base}/avg/jo/")

  /** jo.py:225-229 tokenize gluecondition: same font size, within 1.5
    * line heights — no alignment requirement. */
  def glue(fontspec: Map[Int, PdfReader.FontSpec])
      : (Textbox, Textbox, Textbox) => Boolean =
    (textbox, nextbox, _) =>
      fontspec(textbox.fontid).size == fontspec(nextbox.fontid).size &&
        textbox.top + textbox.height + nextbox.height / 1.5 >= nextbox.top

  /** The JO decision FSM (jo.py:230-376). */
  def structure(boxes: Vector[Textbox],
                fontspec: Map[Int, PdfReader.FontSpec],
                warn: String => Unit = _ => ()): TreeNode = {
    import FsmParser.{Config, Constructor, Recognizer, Transition}
    type P = FsmParser[Textbox]
    def size(b: Textbox): Int = fontspec(b.fontid).size
    def peek(p: P): Textbox = p.reader.peek()

    val recognizers = Vector(
      Recognizer[Textbox]("is_datum", p => size(peek(p)) == 12 &&
        Pattern.compile("\\d{4}-\\d{2}-\\d{2}")
          .matcher(peek(p).text).lookingAt()),
      Recognizer[Textbox]("is_dnr", p => size(peek(p)) == 12 &&
        Pattern.compile("\\d+-\\d{2,4}")
          .matcher(peek(p).text).lookingAt()),
      Recognizer[Textbox]("is_nonessential", p =>
        peek(p).top >= 1159 || peek(p).top <= 146),
      Recognizer[Textbox]("is_heading", p => size(peek(p)) == 17),
      Recognizer[Textbox]("is_abstract",
        p => peek(p).text.startsWith("Beslutet i korthet:")),
      Recognizer[Textbox]("is_section", p => size(peek(p)) == 14 &&
        peek(p).els.headOption.exists(_.tag.contains("b")) &&
        !peek(p).text.endsWith(".")),
      Recognizer[Textbox]("is_blockquote", p => peek(p).left >= 255),
      Recognizer[Textbox]("is_normal", p => peek(p).left < 255),
      Recognizer[Textbox]("is_paragraph", _ => true))

    def meta(pred: String, values: Seq[String], datatype: Option[String],
             lang: Option[String]): TreeNode =
      TreeNode("Meta",
        Vector("predicate" -> pred) ++
          datatype.map("datatype" -> _) ++ lang.map("lang" -> _),
        children = values.map(TreeNode.str).toVector)

    val makeBody = Constructor[Textbox]("make_body", pushesState = true,
      p => Some(p.makeChildren(TreeNode("Body"))))
    val makeHeading = Constructor[Textbox]("make_heading",
      pushesState = false, p => Some(meta(Vocab.dcterms("title"),
        Seq(OfftryckParser.pyStrip(p.reader.next().text)), None,
        Some("sv"))))
    val makeAbstract = Constructor[Textbox]("make_abstract",
      pushesState = true, p => {
        val first = TreeNode("Paragraph",
          text = Some(p.reader.next().text))
        Some(p.makeChildren(TreeNode("Abstract",
          children = Vector(first))))
      })
    val makeSection = Constructor[Textbox]("make_section",
      pushesState = true, p => Some(p.makeChildren(
        TreeNode("UnorderedSection", Vector(
          "title" -> OfftryckParser.pyStrip(p.reader.next().text))))))
    val makeBlockquote = Constructor[Textbox]("make_blockquote",
      pushesState = true,
      p => Some(p.makeChildren(TreeNode("Blockquote"))))
    val makeParagraph = Constructor[Textbox]("make_paragraph",
      pushesState = false,
      p => Some(TreeNode("Paragraph", text = Some(p.reader.next().text))))
    val makeDatum = Constructor[Textbox]("make_datum",
      pushesState = false, p => {
        val datestr = OfftryckParser.pyStrip(p.reader.next().text)
        val year = datestr.split("-")(0).toInt
        if (year > 1970 && year < 2100) {
          p.removeRecognizer("is_datum")
          Some(meta(Vocab.rpubl("avgorandedatum"), Seq(datestr),
            Some(Vocab.xsd("date")), None))
        } else { warn(s"Year in $datestr doesn't look valid"); None }
      })
    val makeDnr = Constructor[Textbox]("make_dnr",
      pushesState = false, p => {
        p.removeRecognizer("is_dnr")
        val ds = OfftryckParser.pyStrip(p.reader.next().text)
          .split(" ").toSeq
        Some(meta(Vocab.rpubl("diarienummer"), ds, None, None))
      })
    val skipNonessential = Constructor[Textbox]("skip_nonessential",
      pushesState = false, p => { p.reader.next(); None })

    val F = None
    val t = Map.newBuilder[(String, String), Transition[Textbox]]
    def add(st: String, rec: String, ctor: Option[Constructor[Textbox]],
            ns: Option[String]): Unit =
      t += ((st, rec) -> Transition[Textbox](ctor, ns))
    add("body", "is_heading", Some(makeHeading), None)
    add("body", "is_nonessential", Some(skipNonessential), None)
    add("body", "is_datum", Some(makeDatum), None)
    add("body", "is_dnr", Some(makeDnr), None)
    add("body", "is_abstract", Some(makeAbstract), Some("abstract"))
    add("body", "is_section", Some(makeSection), Some("section"))
    add("body", "is_blockquote", Some(makeBlockquote), Some("blockquote"))
    add("body", "is_paragraph", Some(makeParagraph), None)
    add("abstract", "is_paragraph", Some(makeParagraph), None)
    add("abstract", "is_section", F, None)
    add("abstract", "is_dnr", F, None)
    add("abstract", "is_datum", F, None)
    add("section", "is_paragraph", Some(makeParagraph), None)
    add("section", "is_nonessential", Some(skipNonessential), None)
    add("section", "is_section", F, None)
    add("section", "is_blockquote", Some(makeBlockquote),
      Some("blockquote"))
    add("section", "is_datum", Some(makeDatum), None)
    add("section", "is_dnr", Some(makeDnr), None)
    add("blockquote", "is_blockquote", Some(makeParagraph), None)
    add("blockquote", "is_nonessential", Some(skipNonessential), None)
    add("blockquote", "is_section", F, None)
    add("blockquote", "is_normal", F, None)
    add("blockquote", "is_datum", Some(makeDatum), None)
    add("blockquote", "is_dnr", Some(makeDnr), None)

    new FsmParser[Textbox](
      Config(recognizers, t.result(), "body", makeBody),
      boxes.iterator).parse()
  }

  /** postprocess_doc (jo.py:189-224): lift Meta nodes into triples —
    * the in-document title wins, dcterms:issued falls back to the
    * decision date. Returns (body-without-Meta, lifted triples). */
  def postprocess(body: TreeNode, uri: String, graph: String,
                  hadTitle: Boolean): (TreeNode, Vector[Triple]) = {
    val triples = Vector.newBuilder[Triple]
    var sawTitle = hadTitle
    def lift(n: TreeNode): TreeNode =
      n.copy(children = n.children.flatMap {
        case m if m.tag == "Meta" =>
          val pred = m.attr("predicate").get
          val dt = m.attr("datatype")
          val lang = m.attr("lang")
          m.children.flatMap(_.text).foreach { v =>
            if (pred == Vocab.dcterms("title")) sawTitle = true
            triples += Triple(uri, pred, v, objIsLiteral = true, dt, lang,
              graph)
          }
          None
        case sub if sub.children.nonEmpty => Some(lift(sub))
        case other => Some(other)
      })
    val cleaned = lift(body)
    val lifted = triples.result()
    val issuedFallback = lifted
      .find(_.pred == Vocab.rpubl("avgorandedatum"))
      .map(d => Triple(uri, Vocab.dcterms("issued"), d.obj,
        objIsLiteral = true, d.objDatatype, None, graph))
    (cleaned, lifted ++ issuedFallback.toVector)
  }

  def parse(src: SourceFile): RfcDoc.Parsed = parse(src, Conf())

  /** Full chain over a pdf2xml intermediate: read → glue → FSM →
    * postprocess → triples (basefile-inferred identifier + type, the
    * #USn DocumentPart decoration). */
  def parse(src: SourceFile, conf: Conf): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    // path ".../2012/6356.jo" → basefile "6356-2012"
    val parts = src.path.replaceAll("\\.jo$", "").split("/")
    val basefile = s"${parts.last}-${parts(parts.length - 2)}"
    val uri = conf.baseUri + basefile

    val pdf = PdfReader.parseXml(src.content)
    val boxes = pdf.textboxes(glue(pdf.fontspec))
    val body0 = structure(boxes, pdf.fontspec)
    val (body, lifted) = postprocess(body0, uri, graph, hadTitle = false)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.JoDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, AvgType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("identifier"),
      s"JO dnr $basefile", graph)
    triples ++= lifted
    // decorate the unordered sections (#USn DocumentParts)
    var us = 0
    def decorate(n: TreeNode): Unit = {
      if (n.tag == "UnorderedSection") {
        us += 1
        val secUri = s"$uri#US$us"
        triples += Triple.uri(secUri, Vocab.RDF_TYPE,
          Vocab.bibo("DocumentPart"), graph)
        triples += Triple.lit(secUri, Vocab.dcterms("title"),
          n.attr("title").get, graph, lang = Some("sv"))
      }
      n.children.foreach(decorate)
    }
    decorate(body)

    val title = lifted.find(_.pred == Vocab.dcterms("title"))
      .map(_.obj).getOrElse("")
    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(body),
      RfcDoc.sha256Hex(src.content), triples.result(), Vector.empty)
  }
}
