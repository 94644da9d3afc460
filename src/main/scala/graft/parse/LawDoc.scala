package graft.parse

import graft.kg.EntityDict
import graft.model.{Mention, SourceFile, Triple, Vocab}

/** Fourth document family: Swedish statute text (`*.law`), parsed by the
  * stateful dictionary-driven [[LawRef]] citation parser — the graft
  * counterpart of the reference's LegalRef-based SFS repository
  * (/root/reference/ferenda/sources/legal/se/legalref.py driving
  * sources/legal/se). One [[LawRef.Parser]] instance per document keeps
  * the anaphora state (`lastLaw`, learned names) the family exists to
  * exercise; the named-law dictionary is the corpus-level dictionary the
  * pipeline would broadcast at deployment scale (the reference loads it
  * from the rdfs:label graph, legalref.py:258-266).
  */
object LawDoc {

  val LawType: String = Vocab.rfc("Law")
  /** URI space for statutes: {base}/sfs/{year:no}[#fragment]. */
  val base: String = s"${EntityDict.base}/sfs/"

  /** Corpus-level named-law dictionary (pure function of the capped
    * corpus size — at 10^12-file scale this is a broadcast variable fed
    * from a curated table; here it is deterministic synthesis). */
  lazy val corpusDictionary: Map[String, String] =
    graft.kg.Corpus.lawDictionary(graft.kg.Corpus.MaxLaws)

  def sfsIdFromPath(path: String): String =
    path.replaceAll("^.*/", "").replaceAll("\\.law$", "").replace("_", ":")

  def mintUri(id: String): String = base + id

  def parse(src: SourceFile): RfcDoc.Parsed = parse(src, corpusDictionary)

  def parse(src: SourceFile, dict: Map[String, String]): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val ownId = sfsIdFromPath(src.path)
    val uri = mintUri(ownId)

    // first line = title; the body below the first blank line is scanned
    // (the reference parses citations in running text, not headers)
    val headSplit = src.content.split("\n\n", 2)
    val title = headSplit(0).linesIterator.next().trim
    val body = if (headSplit.length > 1) headSplit(1) else ""

    val conf = LawRef.Conf(base = base, baseLaw = Some(ownId),
      namedLaws = dict)
    val segs = LawRef.parse(body, conf)
    // the other citation families over the same body (preparatory works,
    // court reports): independent grammars, independent mention streams —
    // the reference runs LegalRef with multiple modes the same way
    val uriBase = s"${EntityDict.base}/"
    val forarbSegs = new ForarbRef.Parser(ForarbRef.Conf(uriBase)).parse(body)
    val domSegs = new RattsfallRef.Parser(RattsfallRef.Conf(uriBase)).parse(body)

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.LawDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, LawType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("sv"))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"), ownId, graph)

    val mentions = Vector.newBuilder[Mention]
    def collect(out: Vector[LawRef.Seg], grammar: LawRef.Seg => String): Unit = {
      var off = 0
      out.foreach { seg =>
        seg.uri.foreach { target =>
          mentions += Mention(docId, src.repo, src.lang, grammar(seg),
            seg.text, off, off + seg.text.length, target, uri)
        }
        off += seg.text.length
      }
    }
    collect(segs, seg => if (seg.anaphoric) "LawRefSame" else "LawRef")
    collect(forarbSegs, _ => "ForarbRef")
    collect(domSegs, _ => "RattsfallRef")

    val tree = TreeNode("Law",
      children = body.split("\n\n+").toVector.filter(_.nonEmpty)
        .map(p => TreeNode("Paragraph").appendText(p.trim)))

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(tree),
      RfcDoc.sha256Hex(src.content), triples.result(), mentions.result())
  }
}
