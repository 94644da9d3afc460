package graft.parse

import graft.kg.EntityDict
import graft.model.{SourceFile, Triple, Vocab}

/** EUR-Lex act doctype — the CELEX-structured metadata slice of the
  * reference's EURLex repo
  * (/root/reference/ferenda/sources/legal/eu/eurlex.py:352-360 +
  * EURLexStore celex handling): the act's type is read off the CELEX
  * number itself (6th character: L = directive, R = regulation,
  * C = CJEU decision; sector digit + 4-digit year in positions 0-4),
  * the id is kept as cdm:resource_legal_id_celex, and the first text
  * line is the act title. Owning these entities makes EuActRef
  * mentions resolvable targets (kg_deps eu edges) instead of
  * minted-only URIs. */
object EuDoc {

  val Cdm = "http://publications.europa.eu/ontology/cdm#"

  def typeOf(celex: String): String = celex.charAt(5) match {
    case 'R' => Cdm + "regulation"
    case 'L' => Cdm + "directive"
    case 'C' => Cdm + "decision_cjeu"
    case c => throw new IllegalArgumentException(
      s"unknown CELEX document type '$c' in $celex")
  }

  /** The law family's citation space — EuActRef targets resolve here. */
  def mintUri(celex: String): String =
    s"${EntityDict.base}/ext/celex/$celex"

  def parse(src: SourceFile): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val celex = src.path.replaceAll("^.*/", "").replaceAll("\\.eu$", "")
    require(celex.length >= 10 && celex.forall(c =>
      c.isDigit || c.isUpper), s"malformed CELEX basefile: $celex")
    val uri = mintUri(celex)
    val title = src.content.linesIterator.next().trim

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.EuDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, typeOf(celex), graph)
    triples += Triple.lit(uri, Cdm + "resource_legal_id_celex", celex,
      graph)
    triples += Triple.lit(uri, Vocab.dcterms("identifier"), celex, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some(src.lang))
    // year of adoption from the CELEX structure (positions 1-4)
    triples += Triple.lit(uri, Vocab.rpubl("arsutgava"),
      celex.substring(1, 5), graph)

    RfcDoc.Parsed(docId, uri, title, None,
      TreeNode.toXml(TreeNode("Body", children = Vector(
        TreeNode.str(src.content)))),
      RfcDoc.sha256Hex(src.content), triples.result(), Vector.empty)
  }
}
