package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{SfsParser, TreeNode}
import java.nio.file.Files

/** Golden parity against the reference's OWN sfs parser fixture suite
  * (/root/reference/test/files/sfs/parse — the pairs its
  * integrationSFS.py runs): for every fixture whose expected XML is
  * STRUCTURE-ONLY, [[SfsParser]] must reproduce the reference's
  * expected tree exactly (canonical equality, ids stripped).
  *
  * Scoping mirrors the reference harness and our cited scope-outs:
  *  - the reference's own `brokentests` list (integrationSFS.py:81-96)
  *    is excluded, as in its own harness;
  *  - fixtures whose expected XML carries citation Links / definition
  *    Begrepp markup are excluded — integrationSFS.py:19-56 runs
  *    find_definitions + lagrum_parser over lagen.nu's URISpace on top
  *    of the structure parse; those surfaces are covered separately
  *    (LawRefGoldenSpec for citations, LawDoc for the mention path);
  *  - `id` attributes are stripped from the expected trees: the
  *    construct_id pass is URI minting, covered by LawDoc/Coin.
  *
  * Loading mirrors the harness: ISO-8859-1, DOS linesep normalized to
  * "\n", whitespace otherwise UNTOUCHED (column alignment must reach
  * the table parser) — SfsParser's own Reader applies the chunk-level
  * autostrip exactly as integrationSFS.py:32-35 does
  * (TextReader(encoding='iso-8859-1', linesep=DOS);
  * reader.autostrip = True).
  */
class SfsGoldenSpec extends AnyFunSuite {

  private val dir = new java.io.File("/root/reference/test/files/sfs/parse")

  /** integrationSFS.py:81-96 — the reference's own broken list. */
  private val broken = Set(
    "definition-no-definition.txt",
    "definition-paranthesis-lista.txt",
    "definition-paranthesis-multiple.txt",
    "definition-strecksatslista-andrastycke.txt",
    "extra-overgangsbestammelse-med-rubriker.txt",
    "regression-10kap-ellagen.txt",
    "tricky-felformatterad-tabell.txt",
    "tricky-lang-rubrik.txt",
    "tricky-lista-inte-rubrik.txt",
    "tricky-lista-not-rubriker-2.txt",
    "tricky-lopande-rubriknumrering.txt",
    "tricky-okand-aldre-lag.txt",
    "tricky-paragraf-inledande-tomrad.txt",
    "tricky-tabell-overgangsbest.txt",
    "tricky-tabell-sju-kolumner.txt")

  private def stripIds(n: TreeNode): TreeNode =
    n.copy(attrs = n.attrs.filterNot(_._1 == "id"),
      children = n.children.map(stripIds))

  private val fixtures: Seq[(java.io.File, java.io.File)] =
    dir.listFiles.filter(_.getName.endsWith(".txt")).sortBy(_.getName)
      .filterNot(f => broken(f.getName))
      .flatMap { txt =>
        val xml = new java.io.File(dir, txt.getName.replace(".txt", ".xml"))
        if (!xml.exists()) None
        else {
          val x = new String(Files.readAllBytes(xml.toPath), "UTF-8")
          val inScope = !x.contains("<Link") && !x.contains("Begrepp")
          if (inScope) Some((txt, xml)) else None
        }
      }.toSeq

  test("the structure-only fixture set is substantial") {
    assert(fixtures.length >= 60, fixtures.map(_._1.getName).toString)
  }

  fixtures.foreach { case (txt, xml) =>
    test(s"golden: ${txt.getName}") {
      val text = new String(Files.readAllBytes(txt.toPath), "ISO-8859-1")
        .replace("\r\n", "\n") // DOS linesep only; keep column whitespace
      // the harness parses as basefile 9999:998 (integrationSFS.py:26)
      val got = stripIds(SfsParser.parse(text, Some("9999:998")))
      val want = stripIds(TreeNode.fromXml(
        new String(Files.readAllBytes(xml.toPath), "UTF-8")))
      assert(TreeNode.canonical(got) == TreeNode.canonical(want),
        s"\ngot:  ${TreeNode.canonical(got)}\nwant: ${TreeNode.canonical(want)}")
    }
  }

  // ---------------------------------------------------------------------
  // The FULL-pipeline fixtures (citation / definition markup): structure
  // parse + construct_id + find_definitions + lagrum citation marking,
  // exactly the passes integrationSFS.py:51-55 runs. Expected trees are
  // compared WITH ids (construct_id is under test here); node uris are
  // absent on both sides (the harness's _remove_uri_for_testcases keeps
  // only LinkSubject uris, and graft.parse.SfsMarkup materializes ids
  // without uri attrs).
  // ---------------------------------------------------------------------

  /** rdfs:label lines of the reference's public sfs.ttl → normalized
    * name → SFS id — the same dictionary source its harness loads
    * (legalref.py:258-266), as in LawRefGoldenSpec. */
  private lazy val namedLaws: Map[String, String] = {
    val src = scala.io.Source.fromFile(
      "/root/reference/lagen/nu/res/extra/sfs.ttl", "utf-8")
    try {
      val re = """<https://lagen\.nu/([^>]+)>\s+rdfs:label\s+"([^"]+)"""".r
      re.findAllMatchIn(src.mkString).map { m =>
        graft.parse.LawRef.normalizeLawName(m.group(2)) -> m.group(1)
      }.toMap
    } finally src.close()
  }

  private val markupFixtures: Seq[(java.io.File, java.io.File)] =
    dir.listFiles.filter(_.getName.endsWith(".txt")).sortBy(_.getName)
      .filterNot(f => broken(f.getName))
      .flatMap { txt =>
        val xml = new java.io.File(dir, txt.getName.replace(".txt", ".xml"))
        if (!xml.exists()) None
        else {
          val x = new String(Files.readAllBytes(xml.toPath), "UTF-8")
          if (x.contains("<Link") || x.contains("Begrepp")) Some((txt, xml))
          else None
        }
      }.toSeq

  test("the markup fixture set covers the rest of the suite") {
    assert(markupFixtures.length >= 40, markupFixtures.map(_._1.getName))
  }

  markupFixtures.foreach { case (txt, xml) =>
    test(s"golden (ids+definitions+citations): ${txt.getName}") {
      val text = new String(Files.readAllBytes(txt.toPath), "ISO-8859-1")
        .replace("\r\n", "\n")
      val tree = SfsParser.parse(text, Some("9999:998"))
      val got = graft.parse.SfsMarkup.markup(tree, "9999:998", namedLaws)
      val want = TreeNode.fromXml(
        new String(Files.readAllBytes(xml.toPath), "UTF-8"))
      assert(TreeNode.canonical(got) == TreeNode.canonical(want),
        s"\ngot:  ${TreeNode.canonical(got)}\nwant: ${TreeNode.canonical(want)}")
    }
  }
}
