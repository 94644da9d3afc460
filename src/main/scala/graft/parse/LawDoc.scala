package graft.parse

import graft.kg.EntityDict
import graft.model.{Mention, SourceFile, Triple, Vocab}

/** Fourth document family: Swedish statute text (`*.law`) — the graft
  * counterpart of the reference's SFS repository
  * (/root/reference/ferenda/sources/legal/se/sfs.py driving legalref.py).
  *
  * Two cooperating parsers per document:
  *  - [[SfsParser]] builds the STRUCTURE tree (Kapitel/Paragraf/Stycke/
  *    Rubrik/lists — sfs_parser.py's forfattningstext slice), from which
  *    chapters and sections are emitted as sub-resources: `#K{n}` /
  *    `#K{n}P{m}` fragments typed rpubl:Kapitel / rpubl:Paragraf with
  *    dcterms:isPartOf chains (sfs.py:1127 predicate mapping) — so lagrum
  *    mentions anchor to section entities exactly like rfc `#S` fragments
  *    and the annotations isPartOf closure covers the law family;
  *  - the five stateful citation parsers run over every text span IN
  *    DOCUMENT ORDER, each mention anchored at the nearest enclosing
  *    section's URI (the reference attaches reference triples to the
  *    closest element carrying `about` — citationparser.py:98-165). One
  *    [[LawRef.Parser]] instance per document keeps the anaphora state
  *    (`lastLaw`, learned names) across stycken, exactly as the reference
  *    keeps parser state across basefile paragraphs.
  *
  * The named-law dictionary is the corpus-level dictionary the pipeline
  * would broadcast at deployment scale (the reference loads it from the
  * rdfs:label graph, legalref.py:258-266).
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

  /** KORTLAGRUM abbreviation dictionary (the reference's
    * dcterms:alternate graph, legalref.py:268-281). */
  lazy val corpusAbbrevs: Map[String, String] =
    graft.kg.Corpus.lawAbbrevs(graft.kg.Corpus.MaxLaws)

  def sfsIdFromPath(path: String): String =
    path.replaceAll("^.*/", "").replaceAll("\\.law$", "").replace("_", ":")

  def mintUri(id: String): String = base + id

  /** The official-space equivalent of a minted act URI (the rinfo COIN
    * space base + slug the reference's sameas minter produces for
    * rpubl:KonsolideradGrundforfattning/SFS acts). */
  def rinfoUri(id: String): String =
    s"http://rinfo.lagrummet.se/publ/sfs/$id"

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

    // ---- structure (SfsParser: Forfattning → Kapitel → Paragraf → Stycke)
    val tree = SfsParser.parse(body, Some(ownId))

    // ---- per-document stateful citation parsers (document order)
    val uriBase = s"${EntityDict.base}/"
    val lawParser = new LawRef.Parser(LawRef.Conf(base = base,
      baseLaw = Some(ownId), namedLaws = dict, abbrevs = corpusAbbrevs))
    val forarbParser = new ForarbRef.Parser(ForarbRef.Conf(uriBase))
    val domParser = new RattsfallRef.Parser(RattsfallRef.Conf(uriBase))
    val euParser = new EuActRef.Parser(EuActRef.Conf(uriBase))
    val avgParser = new AvgRef.Parser(AvgRef.Conf(uriBase))

    val triples = Vector.newBuilder[Triple]
    triples += Triple.lit(uri, Vocab.PROV + "wasGeneratedBy",
      "graft.parse.LawDoc", graph)
    triples += Triple.uri(uri, Vocab.RDF_TYPE, LawType, graph)
    triples += Triple.lit(uri, Vocab.dcterms("title"), title, graph,
      lang = Some("sv"))
    triples += Triple.lit(uri, Vocab.dcterms("identifier"), ownId, graph)
    // equivalent-URI statement: the same act re-minted under the official
    // rinfo URI space (the lagen.nu SameAs mixin, lagen/nu/sameas.py:54-88
    // re-coins the resource with the rinfo minter; for an SFS act the
    // coined form is publ/sfs/<year>:<no>). These owl:sameAs edges feed
    // canonicalization so the CC runs over realistic legal aliases.
    triples += Triple.uri(uri, Vocab.OWL_SAMEAS, LawDoc.rinfoUri(ownId),
      graph)

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
      collect(euParser.parse(text), _ => "EuActRef")
      collect(avgParser.parse(text), _ => "AvgRef")
      off += text.length + 1
    }

    // "2 a" chapter/section ordinals → "2a" fragment slugs (the legaluri
    // fragment alphabet, legaluri.py:63-65)
    def slug(ord: String): String = ord.replace(" ", "")

    def structureTriples(secUri: String, parentUri: String, tpe: String,
                         numPred: String, ordinal: String): Unit = {
      triples += Triple.uri(secUri, Vocab.RDF_TYPE, Vocab.rpubl(tpe), graph)
      triples += Triple.uri(secUri, Vocab.dcterms("isPartOf"), parentUri, graph)
      triples += Triple.lit(secUri, Vocab.rpubl(numPred), ordinal, graph)
    }

    /** Walk in document order: structure triples for Kapitel/Paragraf,
      * citation scan over every text span anchored at the enclosing
      * sub-resource, with the enclosing (chapter, section) ordinals fed
      * to the LawRef parser as base context (the reference derives
      * baseuri_attributes from the nearest `about` URI the same way,
      * swedishlegalsource.py:1653-1668). Headings are never scanned
      * (parse_recursive skips Rubrik/H1-H3/links,
      * swedishlegalsource.py:1624-1631). */
    def walk(n: TreeNode, subj: String, kapFrag: String,
             ctxCh: Option[String], ctxSec: Option[String]): Unit =
      n.tag match {
        case "Kapitel" =>
          val ord = n.attr("ordinal").get
          val kf = "K" + slug(ord)
          val kUri = s"$uri#$kf"
          structureTriples(kUri, uri, "Kapitel", "kapitelnummer", ord)
          n.children.foreach(walk(_, kUri, kf, Some(ord), None))
        case "Paragraf" =>
          val ord = n.attr("ordinal").get
          val pf = kapFrag + "P" + slug(ord)
          val pUri = s"$uri#$pf"
          structureTriples(pUri, subj, "Paragraf", "paragrafnummer", ord)
          n.children.foreach(walk(_, pUri, kapFrag, ctxCh, Some(ord)))
        case "Rubrik" => () // headings are not citation-scanned
        case _ =>
          n.text.foreach { t =>
            lawParser.setContext(ctxCh, ctxSec)
            scan(t, subj)
          }
          n.children.foreach(walk(_, subj, kapFrag, ctxCh, ctxSec))
      }
    walk(tree, uri, "", None, None)

    RfcDoc.Parsed(docId, uri, title, None, TreeNode.toXml(tree),
      RfcDoc.sha256Hex(src.content), triples.result(), mentions.result())
  }
}
