package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{SfsParser, TreeNode}

/** SFS statute-structure parser: the tree for a hand-written statute is
  * derived BY HAND here (never by running the parser on itself), covering
  * chapters (incl. "2 a kap." letter ordinals and the m.m. heading
  * exception), sections with multiple stycken, rubrik/underrubrik levels,
  * all three list forms with a sublist, the TOC fake-chapter guard
  * (sfs_parser.py:650-663), and the false-positive filters. */
class SfsParserSpec extends AnyFunSuite {

  private def el(tag: String, attrs: (String, String)*)(
      children: TreeNode*): TreeNode =
    TreeNode(tag, attrs.toVector, None, children.toVector)
  private def str(s: String): TreeNode = TreeNode.str(s)
  private def rubrik(s: String, attrs: (String, String)*): TreeNode =
    TreeNode("Rubrik", attrs.toVector, text = Some(s))

  test("golden structure tree: chapters, sections, stycken, rubriker, lists") {
    val text =
      """1 kap. Inledande bestämmelser
        |
        |1 § Lagen gäller verksamhet som avses i 5 § andra stycket.
        |
        |Denna paragraf har två stycken.
        |
        |2 § Vid prövningen beaktas
        |
        |1. första punkten
        |
        |2. andra punkten med underpunkter
        |
        |a) liten bokstav
        |
        |b) andra bokstaven
        |
        |3. tredje punkten
        |
        |Särskilda villkor
        |
        |Närmare föreskrifter
        |
        |3 § Följande gäller
        |
        |- första strecksatsen
        |
        |- andra strecksatsen
        |
        |2 a kap. Avgifter m.m.
        |
        |1 § Avgift tas ut enligt denna paragraf. Lag (1998:204).
        |""".stripMargin

    val want = el("Forfattning")(
      el("Kapitel", "ordinal" -> "1", "rubrik" -> "1 kap. Inledande bestämmelser")(
        el("Paragraf", "ordinal" -> "1")(
          el("Stycke")(str("Lagen gäller verksamhet som avses i 5 § andra stycket.")),
          el("Stycke")(str("Denna paragraf har två stycken."))),
        el("Paragraf", "ordinal" -> "2")(
          el("Stycke")(
            str("Vid prövningen beaktas"),
            el("NumreradLista")(
              el("Listelement", "ordinal" -> "1")(str("första punkten")),
              el("Listelement", "ordinal" -> "2")(
                str("andra punkten med underpunkter"),
                el("Bokstavslista")(
                  el("Listelement", "ordinal" -> "a")(str("liten bokstav")),
                  el("Listelement", "ordinal" -> "b")(str("andra bokstaven")))),
              el("Listelement", "ordinal" -> "3")(str("tredje punkten"))))),
        rubrik("Särskilda villkor"),
        rubrik("Närmare föreskrifter", "type" -> "underrubrik"),
        el("Paragraf", "ordinal" -> "3")(
          el("Stycke")(
            str("Följande gäller"),
            el("Strecksatslista")(
              el("Listelement", "ordinal" -> "1")(str("första strecksatsen")),
              el("Listelement", "ordinal" -> "2")(str("andra strecksatsen")))))),
      el("Kapitel", "ordinal" -> "2 a", "rubrik" -> "2 a kap. Avgifter m.m.")(
        el("Paragraf", "ordinal" -> "1")(
          el("Stycke")(
            str("Avgift tas ut enligt denna paragraf. Lag (1998:204).")))))

    val got = SfsParser.parse(text)
    assert(TreeNode.canonical(got) == TreeNode.canonical(want),
      s"\ngot:  ${TreeNode.canonical(got)}\nwant: ${TreeNode.canonical(want)}")
  }

  test("avdelning: division headings with underrubrik, all id styles") {
    val text =
      """FÖRSTA AVDELNINGEN
        |
        |Övergripande bestämmelser
        |
        |1 kap. Inledning
        |
        |1 § Lagen gäller här.
        |
        |2 § Andra regeln finns här.
        |
        |2 kap. Fortsättning
        |
        |1 § Andra kapitlets regel.
        |
        |AVD. II PÅFÖLJDER
        |
        |3 kap. Särskilda regler
        |
        |1 § Tredje kapitlets regel.
        |""".stripMargin
    val got = SfsParser.parse(text)
    val avds = got.children.filter(_.tag == "Avdelning")
    assert(avds.map(_.attr("ordinal").get) == Vector("1", "2"))
    assert(avds(0).attr("rubrik").contains("FÖRSTA AVDELNINGEN"))
    assert(avds(0).attr("underrubrik").contains("Övergripande bestämmelser"))
    assert(avds(0).children.filter(_.tag == "Kapitel")
      .map(_.attr("ordinal").get) == Vector("1", "2"))
    // AVD. II has no underrubrik (next line is a chapter)
    assert(avds(1).attr("underrubrik").isEmpty)
    assert(avds(1).children.filter(_.tag == "Kapitel")
      .map(_.attr("ordinal").get) == Vector("3"))
    // id styles resolve (sfs_parser.py:586-620)
    assert(SfsParser.parse("AVDELNING IV. REGLER\n\n5 kap. X\n\n1 § Y.\n")
      .children.head.attr("ordinal").contains("4"))
    assert(SfsParser.parse("Avd. 2 Taxering\n\n5 kap. X\n\n1 § Y.\n")
      .children.head.attr("ordinal").contains("2"))
  }

  test("underavdelning: roman sub-divisions, gated to 2010:110/1942:740") {
    // Mirrors socialförsäkringsbalken's AVD./underavdelning layout —
    // the only structure the reference's gate exists for
    // (sfs_parser.py:572-581); hand-derived, as no fixture carries it.
    val text =
      """AVD. A ÖVERGRIPANDE BESTÄMMELSER
        |
        |I Inledande bestämmelser, definitioner och förklaringar
        |
        |1 kap. Innehåll m.m.
        |
        |1 § Denna balk innehåller bestämmelser om social trygghet.
        |
        |2 § Balken är indelad i avdelningar.
        |
        |II Socialförsäkringsskyddet
        |
        |4 kap. Allmänna bestämmelser
        |
        |1 § Försäkrad är den som uppfyller villkoren.
        |
        |AVD. B FAMILJEFÖRMÅNER
        |
        |III Allmänna bestämmelser
        |
        |8 kap. Vissa bestämmelser
        |
        |1 § Innehållet anges här.
        |""".stripMargin
    val got = SfsParser.parse(text, Some("2010:110"))
    val avds = got.children.filter(_.tag == "Avdelning")
    assert(avds.map(_.attr("ordinal").get) == Vector("A", "B"))
    // the roman heading is a sub-division, NOT the division underrubrik
    assert(avds(0).attr("underrubrik").isEmpty)
    val unds = avds(0).children.filter(_.tag == "Underavdelning")
    assert(unds.map(_.attr("ordinal").get) == Vector("I", "II"))
    assert(unds(0).attr("rubrik").contains(
      "Inledande bestämmelser, definitioner och förklaringar"))
    assert(unds(0).children.filter(_.tag == "Kapitel")
      .map(_.attr("ordinal").get) == Vector("1"))
    assert(unds(1).children.filter(_.tag == "Kapitel")
      .map(_.attr("ordinal").get) == Vector("4"))
    // AVD. B terminates underavdelning II; its own sub-division nests
    assert(avds(1).children.filter(_.tag == "Underavdelning")
      .map(_.attr("ordinal").get) == Vector("III"))
    // trailing dot on the ordinal token is stripped (sfs_parser.py:148-149)
    val dotted = SfsParser.parse(
      "II. Socialförsäkringsskyddet\n\n4 kap. Regler\n\n1 § Text.\n",
      Some("1942:740"))
    assert(dotted.children.head.attr("ordinal").contains("II"))
    // the gate: any other statute keeps roman headings as plain Rubrik
    val ungated = SfsParser.parse(text, Some("1999:175"))
    def tags(n: TreeNode): Vector[String] =
      n.tag +: n.children.flatMap(tags)
    assert(!tags(ungated).contains("Underavdelning"))
  }

  test("revoked stubs: upphävt kapitel and upphävd/renumbered paragraf") {
    val text =
      """1 kap. Inledning
        |
        |1 § Lagen gäller här.
        |
        |2 § Har upphävts genom lag (1990:1342).
        |
        |3 § Tredje regeln gäller fortfarande.
        |
        |2 kap. har upphävts genom lag (1998:204).
        |
        |3 kap. Fortsättning
        |
        |1 § Ny beteckning 2 § genom lag (2001:23).
        |""".stripMargin
    val got = SfsParser.parse(text)
    val k1 = got.children.head
    assert(k1.children.map(_.tag) ==
      Vector("Paragraf", "UpphavdParagraf", "Paragraf"))
    // the revoked stub advances current_section: 3 § still parses
    assert(k1.children(1).attr("ordinal").contains("2"))
    assert(k1.children(2).attr("ordinal").contains("3"))
    assert(got.children.map(_.tag) ==
      Vector("Kapitel", "UpphavtKapitel", "Kapitel"))
    assert(got.children(1).attr("ordinal").contains("2"))
    // the renumbering form is also a stub, not a live paragraf
    assert(got.children(2).children.map(_.tag) == Vector("UpphavdParagraf"))
  }

  test("tail structure: övergångsbestämmelser + bilaga (hand-derived)") {
    val text =
      """1 kap. Inledning
        |
        |1 § Lagen gäller här.
        |
        |Övergångsbestämmelser
        |
        |Denna lag träder i kraft den 1 januari.
        |
        |1998:204
        |
        |1. Äldre föreskrifter gäller fortfarande.
        |
        |2. Mål som inletts prövas enligt äldre rätt.
        |
        |2005:551
        |
        |Vid ikraftträdandet upphör tidigare beslut.
        |
        |Bilaga
        |
        |Förteckning över myndigheter.
        |""".stripMargin
    val want = el("Forfattning")(
      el("Kapitel", "ordinal" -> "1", "rubrik" -> "1 kap. Inledning")(
        el("Paragraf", "ordinal" -> "1")(
          el("Stycke")(str("Lagen gäller här.")))),
      el("Overgangsbestammelser", "rubrik" -> "Övergångsbestämmelser")(
        // the initial un-keyed stycke wraps with the assumed sfsnr
        el("Overgangsbestammelse", "sfsnr" -> "0000:000")(
          el("Stycke")(str("Denna lag träder i kraft den 1 januari."))),
        el("Overgangsbestammelse", "sfsnr" -> "1998:204")(
          el("NumreradLista")(
            el("Listelement", "ordinal" -> "1")(
              str("Äldre föreskrifter gäller fortfarande.")),
            el("Listelement", "ordinal" -> "2")(
              str("Mål som inletts prövas enligt äldre rätt.")))),
        el("Overgangsbestammelse", "sfsnr" -> "2005:551")(
          el("Stycke")(str("Vid ikraftträdandet upphör tidigare beslut.")))),
      el("Bilaga", "rubrik" -> "Bilaga")(
        el("Stycke")(str("Förteckning över myndigheter."))))
    val got = SfsParser.parse(text)
    assert(TreeNode.canonical(got) == TreeNode.canonical(want),
      s"\ngot:  ${TreeNode.canonical(got)}\nwant: ${TreeNode.canonical(want)}")
  }

  test("separator followed by a regular paragraf is an ordinary headline") {
    // sfs_parser.py:1255-1262: "Övergångsbestämmelser" as a rubrik
    val text =
      """1 kap. Regler
        |
        |1 § Första regeln.
        |
        |Övergångsbestämmelser
        |
        |2 § Andra regeln gäller övergångsvis.
        |""".stripMargin
    val got = SfsParser.parse(text)
    assert(!got.children.exists(_.tag == "Overgangsbestammelser"))
    val kap = got.children.find(_.tag == "Kapitel").get
    assert(kap.children.exists(c => c.tag == "Rubrik" &&
      c.text.contains("Övergångsbestämmelser")))
    assert(kap.children.count(_.tag == "Paragraf") == 2)
  }

  test("bare bestämmelse with no separator wraps with rubrik_saknas") {
    val text =
      """1 § Enda paragrafen.
        |
        |1998:204
        |
        |Äldre rätt gäller.
        |""".stripMargin
    val got = SfsParser.parse(text)
    val obs = got.children.find(_.tag == "Overgangsbestammelser").get
    assert(obs.attr("rubrik").contains("[Övergångsbestämmelser]"))
    assert(obs.children.map(_.attr("sfsnr").get) == Vector("1998:204"))
  }

  test("TOC fake-chapter guard: chapter list inside 1 kap. 1 § is not a chapter") {
    // the 2011:1244 shape (sfs_parser.py:650-663): a first chapter whose
    // single 1 § lists the chapters; the listed "2 kap."/"3 kap." lines
    // must NOT open chapters, but the REAL "2 kap." afterwards (smaller
    // than the last fake) must.
    val text =
      """1 kap. Om lagen
        |
        |1 § Innehåll
        |
        |2 kap. Avgifter
        |
        |3 kap. Tillsyn och kontroll
        |
        |2 kap. Avgifter
        |
        |1 § Avgift tas ut.
        |""".stripMargin
    val got = SfsParser.parse(text)
    val chapters = got.children.filter(_.tag == "Kapitel")
    assert(chapters.map(_.attr("ordinal").get) == Vector("1", "2"))
    // the real chapter 2 contains its section
    assert(chapters(1).children.exists(c =>
      c.tag == "Paragraf" && c.attr("ordinal").contains("1")))
  }

  test("false positives: cross references and list lines never open structure") {
    // mid-sentence "5 §" with lowercase continuation is a reference, not a
    // section (sfs_parser.py:873-884); "6 kap." ending in " och" is a TOC
    // line, not a chapter (sfs_parser.py:686-704)
    val text =
      """1 kap. Regler
        |
        |1 § Första regeln finns här.
        |
        |2 § Andra regeln med två stycken.
        |
        |6 kap. handlar om annat och
        |
        |5 § i den delen gäller inte.
        |""".stripMargin
    val got = SfsParser.parse(text)
    val kap = got.children.filter(_.tag == "Kapitel")
    assert(kap.map(_.attr("ordinal").get) == Vector("1"))
    val pars = kap.head.children.filter(_.tag == "Paragraf")
    assert(pars.map(_.attr("ordinal").get) == Vector("1", "2"))
    // both stray chunks land as extra stycken of 2 §
    assert(pars(1).children.count(_.tag == "Stycke") == 3)
  }

  test("numCmp orders letter ordinals like the reference's numcmp") {
    assert(SfsParser.numCmp("2", "10") < 0)
    assert(SfsParser.numCmp("2 a", "2") > 0)
    assert(SfsParser.numCmp("2 a", "2 b") < 0)
    assert(SfsParser.numCmp("3", "2 a") > 0)
    assert(SfsParser.numCmp("2", "2") == 0)
  }
}
