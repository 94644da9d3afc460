package graft.parse

import graft.kg.EntityDict
import graft.model.{Mention, SourceFile, Triple, Vocab}

/** Fifth document family: Swedish court-verdict referats (`*.dom`) — the
  * graft counterpart of the reference's DV repository
  * (/root/reference/ferenda/sources/legal/se/dv.py). Two cooperating
  * parsers per document, like the statute family:
  *
  *  - [[DvParser]] builds the referat STRUCTURE (Delmal/Instans/Dom/
  *    Domskal/Domslut/Betankande/Skiljaktig/Tillagg/Endmeta), from which
  *    court instances are emitted as sub-resources: `#I{n}` fragments
  *    typed bibo:DocumentPart with dcterms:isPartOf the referat,
  *    dcterms:creator = the instance's court (the reference renders an
  *    instans as a div with rel dc:creator, dv.py:2121-2150) and
  *    rpubl:avgorandedatum from the instance's Dom
  *    (legaluri.py:43 predicate map);
  *  - the citation parsers (LawRef with the named-law dictionary,
  *    ForarbRef, RattsfallRef) run over every text span in document
  *    order, each mention anchored at the nearest enclosing instance —
  *    referats cite statutes, preparatory works and other cases.
  *
  * The referat's own URI is its NJA id in the RattsfallRef URI shape
  * (dom/nja/{year}s{page}), so citations TO this referat from other
  * documents resolve to it, and [[graft.kg.LegalUri]] round-trips it as
  * RATTSFALL. */
object DvDoc {

  val ReferatType: String = Vocab.rpubl("Rattsfallsreferat") // legaluri.py:48

  /** "dv/HDO/B123-80.dom" → basefile "HDO/B123-80" (court code selects
    * the DvParser matcher subset, dv.py:1815-1828). */
  def basefileFromPath(path: String): String = {
    val parts = path.stripSuffix(".dom").split("/")
    parts.takeRight(2).mkString("/")
  }

  private val NjaId = java.util.regex.Pattern.compile(
    "NJA (\\d{4}) s\\. (\\d+)")

  def parse(src: SourceFile): RfcDoc.Parsed =
    parse(src, LawDoc.corpusDictionary)

  def parse(src: SourceFile, dict: Map[String, String]): RfcDoc.Parsed = {
    val docId = s"${src.repo}/${src.path}@${src.commit}"
    val graph = s"${EntityDict.base}/dataset/${src.repo}"
    val basefile = basefileFromPath(src.path)

    // first line = the referat identifier ("NJA 1998 s. 14"); body below
    val headSplit = src.content.split("\n\n", 2)
    val title = headSplit(0).linesIterator.next().trim
    val body = if (headSplit.length > 1) headSplit(1) else ""
    val idm = NjaId.matcher(title)
    require(idm.lookingAt(), s"referat without an NJA id line: $docId")
    val uri =
      s"${EntityDict.base}/dom/nja/${idm.group(1)}s${idm.group(2)}"

    val tree = DvParser.parse(body, basefile)

    val uriBase = s"${EntityDict.base}/"
    val lawParser = new LawRef.Parser(LawRef.Conf(
      base = s"${EntityDict.base}/sfs/", baseLaw = None, namedLaws = dict,
      abbrevs = LawDoc.corpusAbbrevs))
    val forarbParser = new ForarbRef.Parser(ForarbRef.Conf(uriBase))
    val domParser = new RattsfallRef.Parser(RattsfallRef.Conf(uriBase))

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.DvDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, ReferatType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("sv"))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"), title, graph)

    val mentions = Vector.newBuilder[Mention]
    var off = 0
    def scan(text: String, subj: String): Unit = {
      def collect(segs: Vector[LawRef.Seg],
                  grammar: LawRef.Seg => String): Unit = {
        var o = off
        segs.foreach { seg =>
          seg.uri.foreach { target =>
            mentions += Mention(docId, src.repo, src.lang, grammar(seg),
              seg.text, o, o + seg.text.length, target, subj)
          }
          o += seg.text.length
        }
      }
      collect(lawParser.parse(text),
        seg => if (seg.anaphoric) "LawRefSame" else "LawRef")
      collect(forarbParser.parse(text), _ => "ForarbRef")
      collect(domParser.parse(text), _ => "RattsfallRef")
      off += text.length + 1
    }

    /** Instances in document order (inside Delmal parts too). */
    var instansNo = 0
    def walk(n: TreeNode, subj: String): Unit = n.tag match {
      case "Instans" =>
        instansNo += 1
        val iUri = s"$uri#I$instansNo"
        triples += Triple.uri(iUri, Vocab.RDF_TYPE,
          Vocab.bibo("DocumentPart"), graph)
        triples += Triple.uri(iUri, Vocab.dcterms("isPartOf"), subj, graph)
        n.attr("court").foreach(c =>
          triples += Triple.lit(iUri, Vocab.dcterms("creator"), c, graph))
        // the instance's decision date, from its Dom child
        n.children.collectFirst {
          case d if d.tag == "Dom" && d.attr("avgorandedatum").isDefined =>
            d.attr("avgorandedatum").get
        }.foreach(dt => triples += Triple.lit(iUri,
          Vocab.rpubl("avgorandedatum"), dt, graph,
          datatype = Some(Vocab.xsd("date"))))
        n.children.foreach(walk(_, iUri))
      case "Delmal" =>
        val dUri = s"$uri#D${n.attr("ordinal").getOrElse("")}"
        triples += Triple.uri(dUri, Vocab.RDF_TYPE,
          Vocab.bibo("DocumentPart"), graph)
        triples += Triple.uri(dUri, Vocab.dcterms("isPartOf"), uri, graph)
        n.children.foreach(walk(_, dUri))
      case "Heading" => () // headings are not citation-scanned
      case _ =>
        n.text.foreach(scan(_, subj))
        n.children.foreach(walk(_, subj))
    }
    walk(tree, uri)

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(tree),
      RfcDoc.sha256Hex(src.content), triples.result(), mentions.result())
  }
}
