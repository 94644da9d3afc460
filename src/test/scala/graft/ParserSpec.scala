package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse._
import graft.model.{SourceFile, Vocab}

/** Golden tests against the reference's own parser fixtures
  * (read-only from /root/reference/test/files/rfc/) — semantics parity,
  * not code parity. */
class ParserSpec extends AnyFunSuite {

  private val fixtureDir = new java.io.File("/root/reference/test/files/rfc")
  private def read(f: String): String = {
    val p = java.nio.file.Paths.get(fixtureDir.getPath, f)
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("golden: basic.txt parses to the basic.xml element tree") {
    assume(fixtureDir.isDirectory)
    val got = RfcParser.parse(read("basic.txt"), basefile = "0")
    val expected = TreeNode.fromXml(read("basic.xml"))
    assert(TreeNode.canonical(got) == TreeNode.canonical(expected))
  }

  test("citation scan: ordered grammars mask earlier matches") {
    val gs = CitationParser.rfcGrammars(n => s"https://example.org/rfc/$n")
    val cits = CitationParser.scan(
      "See section 4.1 of RFC 6809, then [RFC3261] and section 2.", gs)
    assert(cits.map(_.grammar) == Vector("SecRFCRef", "RFCRef", "SecRef"))
    assert(cits.head.candidateUri == "https://example.org/rfc/6809#S4.1")
    assert(cits(1).candidateUri == "https://example.org/rfc/3261")
    assert(cits(2).candidateUri == "#S2")
  }

  test("citation scan: leading zeros stripped, trailing dots trimmed") {
    val gs = CitationParser.rfcGrammars(n => s"https://example.org/rfc/$n")
    val cits = CitationParser.scan("see RFC 0822 and Section 3.2. here", gs)
    assert(cits.exists(_.candidateUri == "https://example.org/rfc/822"))
    assert(cits.exists(_.candidateUri == "#S3.2"))
  }

  test("full parse: basic.txt yields expected metadata triples") {
    assume(fixtureDir.isDirectory)
    val src = SourceFile("rfc-repo", "rfc/basic.txt", "c0", "en", read("basic.txt"))
    val p = RfcDoc.parse(src)
    assert(p.uri == "https://example.org/rfc/6809")
    assert(p.title.startsWith("Mechanism to Indicate Support"))
    assert(p.shortTitle.contains("Proxy Feature"))
    def has(pred: String, obj: String) =
      p.triples.exists(t => t.pred == pred && t.obj == obj)
    assert(has(Vocab.dcterms("identifier"), "RFC 6809"))
    assert(has(Vocab.dcterms("publisher"), "https://example.org/org/ietf"))
    assert(has(Vocab.dcterms("subject"),
      "https://example.org/def/category/standards-track"))
    assert(has(Vocab.dcterms("issued"), "2012-11"))
    assert(p.triples.filter(_.pred == Vocab.dcterms("creator")).size == 3)
    assert(has(Vocab.RDF_TYPE, Vocab.rfc("RFC")))
    assert(has(Vocab.dcterms("issn"), "2070-1721"))
    // section structure triples
    assert(has(Vocab.dcterms("isPartOf"), "https://example.org/rfc/6809"))
    assert(p.triples.exists(t =>
      t.subj == "https://example.org/rfc/6809#S4.1" &&
      t.pred == Vocab.dcterms("isPartOf") &&
      t.obj == "https://example.org/rfc/6809#S4"))
    // mention of [RFC3261] inside a list item
    assert(p.mentions.exists(_.candidateKey == "https://example.org/rfc/3261"))
    // sha256 invariant present
    assert(p.sha256.length == 64)
  }

  test("fuzzy publisher lookup at cutoff 0.8") {
    import graft.kg.EntityDict
    assert(EntityDict.lookup(EntityDict.publishers,
      "Internet Engineering Task Force (IETF)").contains("https://example.org/org/ietf"))
    // near-miss typo still resolves
    assert(EntityDict.lookup(EntityDict.publishers,
      "Internet Enginering Task Force (IETF)").contains("https://example.org/org/ietf"))
    // unrelated label does not
    assert(EntityDict.lookup(EntityDict.publishers, "Acme Packet").isEmpty)
  }

  test("header triples: updates/obsoletes become URI rels") {
    val header = "Network Working Group                                        J. Postel\n" +
      "Request for Comments: 2822                                         ISI\n" +
      "Obsoletes: 822                                              April 2001\n" +
      "Category: Standards Track"
    val ts = RfcDoc.headerTriples(header, "https://example.org/rfc/2822",
      "g", "2822")
    assert(ts.exists(t => t.pred == Vocab.rfc("obsoletes") &&
      t.obj == "https://example.org/rfc/822" && !t.objIsLiteral))
    assert(ts.exists(t => t.pred == Vocab.dcterms("issued") && t.obj == "2001-04" &&
      t.objDatatype.contains(Vocab.xsd("gYearMonth"))))
  }
  test("eulaw grammar: Swedish EU-law citations resolve to CELEX URIs") {
    val g = CitationParser.eulawGrammars(graft.kg.Coin.celexUri)
    val base = graft.kg.EntityDict.base
    val cits = CitationParser.scanWithUrls(
      "Kraven följer även av artikel 29.1 i rådets direktiv 95/46/EG " +
        "av den 24 oktober 1995 enligt gällande rätt.", g)
    assert(cits.map(_.grammar) == Vector("EULawArticleAct"))
    assert(cits.head.candidateUri == s"$base/celex/31995L0046#A29.1")
    val c2 = CitationParser.scanWithUrls(
      "enligt kommissionens förordning (EG) nr 45/2001 av den " +
        "18 december 2000 gäller detta", g)
    assert(c2.map(_.grammar) == Vector("EULawAct"))
    assert(c2.head.candidateUri == s"$base/celex/32001R0045")
    // bare article → doc-relative fragment, resolved by the caller
    val c3 = CitationParser.scanWithUrls("se artikel 5 för detaljer", g)
    assert(c3.map(_.candidateUri) == Vector("#A5"))
    // 2-digit year expansion: 1958 EEC epoch rule
    val c4 = CitationParser.scanWithUrls(
      "Europaparlamentets och rådets direktiv 02/58/EG av den 12 juli 2002", g)
    assert(c4.head.candidateUri == s"$base/celex/32002L0058")
  }
  test("golden: reference url citation fixtures (span boundaries + parts)") {
    val udir = new java.io.File("/root/reference/test/files/citation/url")
    assume(udir.isDirectory)
    def uread(f: String): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(udir.getPath, f)), "UTF-8")
    val urlBlock = """(?s)<url>(.*?)</url>""".r
    val part = """<(\w+)>([^<]*)</\1>""".r
    for (stem <- Seq("basic", "multiple", "query-and-fragment", "running")) {
      val expected = urlBlock.findAllMatchIn(uread(s"$stem.result")).map { m =>
        val ps = part.findAllMatchIn(m.group(1))
          .map(x => x.group(1) -> x.group(2)).toMap
        ps("scheme") + "://" + ps("netloc") + ps.getOrElse("path", "") +
          ps.get("query").map("?" + _).getOrElse("") +
          ps.get("fragment").map("#" + _).getOrElse("")
      }.toVector
      val got = CitationParser.scanWithUrls(uread(s"$stem.txt").trim, Seq.empty)
        .map(_.matchText).toVector
      assert(got == expected, s"$stem: $got vs $expected")
    }
  }
}
