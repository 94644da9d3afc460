package graft.parse

import java.util.regex.Pattern
import graft.kg.EntityDict
import graft.model.{Triple, Vocab}
import graft.parse.PdfReader.Textbox

/** ARN (national board for consumer disputes) decision doctype — the
  * reference's ARN repo (/root/reference/ferenda/sources/legal/se/
  * arn.py:59-300 + the lagen.nu SameAs mixin): metadata from the
  * downloaded HTML fragment's key/value table (Änr / Avgörande /
  * Avdelning cells, the 4th table row's text as title), the trailing
  * "Avgörande <date>; <dnr>" scrub, the subject label minted into the
  * keyword (begrepp) space, and a flat glued-paragraph body with the
  * first-line title fallback. */
object ArnDoc {

  final case class Conf(
      baseUri: String = s"${EntityDict.base}/avg/arn/",
      rinfoBase: String = "http://rinfo.lagrummet.se/publ/avg/arn/",
      publisher: String =
        s"${EntityDict.base}/org/2014/allmanna_reklamationsnamnden",
      keywordBase: String = s"${EntityDict.base}/begrepp/")

  /** arn.py:271-279 tokenize gluecondition: same family AND size,
    * within 7pt, strictly downward. */
  def glue(fontspec: Map[Int, PdfReader.FontSpec])
      : (Textbox, Textbox, Textbox) => Boolean =
    (textbox, nextbox, prevbox) =>
      fontspec(textbox.fontid).family == fontspec(nextbox.fontid).family &&
        fontspec(textbox.fontid).size == fontspec(nextbox.fontid).size &&
        textbox.top + textbox.height + 7 >= nextbox.top &&
        nextbox.top > prevbox.top

  /** extract_metadata (arn.py:226-243) over the HTML fragment: the
    * value cell following a label cell, and the 4th <tr>'s text. */
  def fragmentMetadata(fragment: String): Map[String, String] = {
    val tree = HtmlDoc.soup(fragment)
    def textOf(n: TreeNode): String =
      (n.text.toSeq ++ n.children.map(textOf)).mkString(" ")
        .replaceAll("\\s+", " ").trim
    // all td elements in document order, with their parent tr chain
    def tds(n: TreeNode): Vector[TreeNode] =
      (if (n.tag == "td") Vector(n) else Vector.empty) ++
        n.children.flatMap(tds)
    val cells = tds(tree)
    def nextcell(key: String): String = {
      val idx = cells.indexWhere(c => textOf(c) == key)
      require(idx >= 0 && idx + 1 < cells.length,
        s"Could not find cell key $key")
      textOf(cells(idx + 1))
    }
    def trs(n: TreeNode): Vector[TreeNode] =
      (if (n.tag == "tr") Vector(n) else Vector.empty) ++
        n.children.flatMap(trs)
    val title = textOf(trs(tree)(3))
    Map("rpubl:arendenummer" -> nextcell("Änr"),
      "rpubl:diarienummer" -> nextcell("Änr"),
      "rpubl:avgorandedatum" -> nextcell("Avgörande"),
      "dcterms:issued" -> nextcell("Avgörande"),
      "dcterms:subject" -> nextcell("Avdelning"),
      "dcterms:title" -> title)
  }

  /** sanitize_metadata title scrub (arn.py:245-257). */
  def sanitizeTitle(title: String): Option[String] = {
    val t = OfftryckParser.normalizeSpace(title)
    if (t.isEmpty) None
    else Some(Pattern.compile("Avgörande \\d+-\\d+-\\d+; \\d+-\\d+\\.?")
      .matcher(t).replaceAll("").trim)
  }

  /** Full chain: fragment metadata + glued flat body (get_parser is
    * `Body(list(stream))`) + the first-line title fallback. */
  def parse(pdfXml: String, fragment: Option[String], basefile: String,
            conf: Conf = Conf()): RfcDoc.Parsed = {
    val uri = conf.baseUri + basefile
    val graph = s"${EntityDict.base}/dataset/arn"
    val pdf = PdfReader.parseXml(pdfXml)
    val boxes = pdf.textboxes(glue(pdf.fontspec))
    val body = TreeNode("Body", children = boxes.map(b =>
      TreeNode("Paragraph", text = Some(b.text))))

    val meta = fragment.map(fragmentMetadata).getOrElse(Map.empty)
    val title = meta.get("dcterms:title").flatMap(sanitizeTitle)
      .orElse(boxes.headOption.flatMap(b => sanitizeTitle(b.text)))

    val xsdDate = Vocab.xsd("date")
    val triples = Vector.newBuilder[Triple]
    def lit(p: String, o: String) = Triple.lit(uri, p, o, graph)
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.ArnDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE,
      Vocab.rpubl("VagledandeMyndighetsavgorande"), graph)
    triples += lit(Vocab.dcterms("identifier"), s"ARN $basefile")
    triples += Triple.uri(uri, Vocab.dcterms("publisher"),
      conf.publisher, graph)
    title.foreach(t => triples += Triple(uri, Vocab.dcterms("title"), t,
      objIsLiteral = true, None, Some("sv"), graph))
    meta.get("rpubl:arendenummer").foreach(v =>
      triples += lit(Vocab.rpubl("arendenummer"), v))
    meta.get("rpubl:diarienummer").foreach(v =>
      triples += lit(Vocab.rpubl("diarienummer"), v))
    meta.get("rpubl:avgorandedatum").foreach(v => triples += Triple(uri,
      Vocab.rpubl("avgorandedatum"), v, objIsLiteral = true,
      Some(xsdDate), None, graph))
    meta.get("dcterms:issued").foreach(v => triples += Triple(uri,
      Vocab.dcterms("issued"), v, objIsLiteral = true, Some(xsdDate),
      None, graph))
    // the subject label is minted into the keyword space but kept as a
    // LITERAL (the reference's distilled shape)
    meta.get("dcterms:subject").foreach(v =>
      triples += lit(Vocab.dcterms("subject"),
        WikiDoc.keywordUri(conf.keywordBase, v)))
    // the SameAs mixin's official-space equivalent
    triples += Triple.uri(uri, Vocab.OWL_SAMEAS, conf.rinfoBase + basefile,
      graph)
    // prov:wasDerivedFrom the source PDF, with its human label
    val derived = s"$uri?attachment=index.pdf&repo=arn&dir=downloaded"
    triples += Triple.uri(uri, Vocab.PROV + "wasDerivedFrom", derived,
      graph)
    triples += Triple(derived, Vocab.RDFS_LABEL, s"ARN $basefile",
      objIsLiteral = true, None, Some("sv"), graph)

    RfcDoc.Parsed(s"arn/$basefile", uri, title.getOrElse(""), None,
      TreeNode.toXml(body), RfcDoc.sha256Hex(pdfXml), triples.result(),
      Vector.empty)
  }
}
