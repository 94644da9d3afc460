package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.LawRef

/** Golden parity with the reference's OWN LegalRef fixture suite
  * (the .txt files under /root/reference/test/files/legalref/SFS, driven like
  * /root/reference/test/integrationLegalRef.py): input text and expected
  * `<list>`-serialized output live in one windows-1252 file separated by
  * the first blank line; paragraphs split on `---` share one parser
  * instance (state carries across). The named-law dictionary is loaded
  * from the reference's public rdfs:label data
  * (/root/reference/lagen/nu/res/extra/sfs.ttl), the same source the
  * reference's test harness uses (legalref.py:258-266).
  *
  * Coverage: the grammar subset LawRef implements — section/chapter/piece
  * references, lists and ranges, anonymous/named/same-law tails (incl.
  * the anaphoric "samma lag" back-reference), change refs, SFS numbers.
  */
class LawRefGoldenSpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/test/files/legalref/SFS"

  /** Supported fixture subset — 36 of the 82 SFS fixtures parse
    * byte-identically (each asserted below). The remainder exercise
    * out-of-scope productions: items/"punkten", "meningen" sentences,
    * compound law names ("Radio- och TV-lagen"), NOBASE/BASE harness
    * modes, and the abbreviation (KORTLAGRUM) grammar. */
  private val supported = Seq(
    "sfs-basic-gammal-lag.txt",
    "sfs-basic-intervall.txt",
    "sfs-basic-kapitel-paragraf-stycke.txt",
    "sfs-basic-kapitel-paragraf.txt",
    "sfs-basic-kapitel-paragrafer.txt",
    "sfs-basic-kapitel.txt",
    "sfs-basic-kungorelse.txt",
    "sfs-basic-lag-kapitel-paragrafer-2.txt",
    "sfs-basic-lagar.txt",
    "sfs-basic-paragraf-stycke.txt",
    "sfs-basic-paragraf.txt",
    "sfs-basic-paragrafer.txt",
    "sfs-basic-samma-lag.txt",   // the anaphoric back-reference case
    "sfs-basic-separata-kapitel.txt",
    "sfs-degenerate.txt",
    "sfs-namngiven-grundlagar.txt",
    "sfs-namngiven-referens-4.txt",
    "sfs-namngiven-referens.txt", // dictionary-driven named laws
    "sfs-namngiven-specifik.txt",
    "sfs-regression-err1.txt",
    "sfs-regression-err2.txt",
    "sfs-regression-i18n.txt",
    "sfs-regression-med-och-utan-kapitel.txt",
    "sfs-regression-obestamd-form.txt",
    "sfs-regression-whitespace-2.txt",
    "sfs-samma-forordning.txt",
    "sfs-tricky-1982-713-5.txt",
    "sfs-tricky-andringsnotering.txt",
    "sfs-tricky-gammal-lag.txt",
    "sfs-tricky-i18n.txt",
    "sfs-tricky-lag.txt",
    "sfs-tricky-paragrafer-bokstaver.txt",
    "sfs-tricky-paragrafer-med-enstaka-paragraftecken.txt",
    "sfs-tricky-radbryning-i-hanvisning.txt",
    "sfs-tricky-sammalag.txt",
    "tricky-strange-chars.txt",
  )

  /** rdfs:label lines of sfs.ttl → normalized name → SFS id. */
  private lazy val namedLaws: Map[String, String] = {
    val src = scala.io.Source.fromFile(
      "/root/reference/lagen/nu/res/extra/sfs.ttl", "utf-8")
    try {
      val re = """<https://lagen\.nu/([^>]+)>\s+rdfs:label\s+"([^"]+)"""".r
      re.findAllMatchIn(src.mkString).map { m =>
        LawRef.normalizeLawName(m.group(2)) -> m.group(1)
      }.toMap
    } finally src.close()
  }

  private def xmlEscape(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The reference's elements.serialize() shape for a parse result list. */
  private def serialize(segs: Vector[LawRef.Seg]): String = {
    val body = segs.map { seg =>
      seg.uri match {
        case None => s"  <str>${xmlEscape(seg.text)}</str>"
        case Some(u) =>
          s"""  <Link uri="${xmlEscape(u)}">${xmlEscape(seg.text)}</Link>"""
      }
    }.mkString("\n")
    s"<list>\n$body\n</list>"
  }

  private def readFixture(name: String): (Seq[String], String) = {
    val raw = {
      val src = scala.io.Source.fromFile(s"$fixtureDir/$name", "windows-1252")
      try src.mkString finally src.close()
    }
    val parts = raw.split("\r?\n\r?\n", 2)
    val (data, want) =
      if (parts.length == 1) (parts(0), "")
      else (parts(0), parts(1).replace("\r\n", "\n").trim)
    (data.replace("\r\n", "\n").split("\n---\n").toSeq, want)
  }

  supported.foreach { name =>
    test(s"golden: $name") {
      val (paras, want) = readFixture(name)
      val parser = new LawRef.Parser(LawRef.Conf(namedLaws = namedLaws))
      val got = paras.map(p => serialize(parser.parse(p))).mkString("\n---\n")
      assert(got == want, s"\n--- got ---\n$got\n--- want ---\n$want")
    }
  }

  test("dictionary carries the reference's label data (spot checks)") {
    assert(namedLaws("brottsbalken") == "1962:700")
    assert(namedLaws(LawRef.normalizeLawName("Äktenskapsbalkens")) == "1987:230")
  }

  test("state: learned names and lastLaw persist across paragraphs") {
    val parser = new LawRef.Parser(LawRef.Conf(namedLaws = Map.empty))
    // paragraph 1 teaches the name and sets lastLaw
    val p1 = parser.parse("Se vidare exempellagen (1991:100) om exempel.")
    assert(p1.exists(_.uri.contains("https://lagen.nu/1991:100")))
    // paragraph 2: bare name resolves via the learned map
    val p2 = parser.parse("Enligt exempellagen gäller annat.")
    assert(p2.exists(s => s.text == "exempellagen" &&
      s.uri.contains("https://lagen.nu/1991:100")))
    // paragraph 3: anaphoric back-reference resolves to lastLaw
    val p3 = parser.parse("Vidare enligt 4 § samma lag.")
    assert(p3.exists(s => s.uri.contains("https://lagen.nu/1991:100#P4")))
  }
}
