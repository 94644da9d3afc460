package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.LegalUri
import graft.kg.LegalUri.{Parsed, LAGRUM, RATTSFALL, MYNDIGHETSBESLUT, FORARBETEN, EULAGSTIFTNING}

/** legaluri port: the reference's own construct fixtures reproduced
  * byte-identically (test/files/legaluri/{beslut-jk-basic,lagrum-basic,
  * rattsfall-ad,rattsfall-nja}.{py,txt}), parse of the reference's
  * documented URI-pattern shapes (legaluri.py:57-66), and
  * construct∘parse = identity over this engine's minted URI space. */
class LegalUriSpec extends AnyFunSuite {

  test("reference construct fixtures reproduce byte-identically") {
    // test/files/legaluri/beslut-jk-basic.py → .txt
    assert(LegalUri.rinfo.construct(Parsed(MYNDIGHETSBESLUT,
      Map("dnr" -> "1075-02-40", "myndighet" -> "jk"))) ==
      "http://rinfo.lagrummet.se/publ/avg/jk/1075-02-40")
    // test/files/legaluri/lagrum-basic.py → .txt
    assert(LegalUri.rinfo.construct(Parsed(LAGRUM,
      Map("law" -> "1998:204"))) ==
      "http://rinfo.lagrummet.se/publ/sfs/1998:204")
    // test/files/legaluri/rattsfall-ad.py → .txt (the reference's
    // "rattsfallspublikation" attribute key accepted as-is)
    assert(LegalUri.rinfo.construct(Parsed(RATTSFALL,
      Map("arsutgava" -> "2004", "lopnummer" -> "43",
        "rattsfallspublikation" -> "ad"))) ==
      "http://rinfo.lagrummet.se/publ/rf/ad/2004:43")
    // test/files/legaluri/rattsfall-nja.py → .txt
    assert(LegalUri.rinfo.construct(Parsed(RATTSFALL,
      Map("arsutgava" -> "2004", "rattsfallspublikation" -> "nja",
        "sidnummer" -> "43"))) ==
      "http://rinfo.lagrummet.se/publ/rf/nja/2004/s_43")
  }

  test("parse of the reference's documented URI-pattern shapes") {
    // legaluri.py:63-65 — the LAGRUM pattern with every fragment sign
    val p = LegalUri.rinfo
      .parse("http://rinfo.lagrummet.se/publ/sfs/1998:204#K12P10S2").get
    assert(p.tpe == LAGRUM)
    assert(p.attrs == Map("law" -> "1998:204", "chapter" -> "12",
      "section" -> "10", "piece" -> "2"))
    // legaluri.py:57-59 — the RATTSFALL pattern, page and serial forms
    val nja = LegalUri.rinfo
      .parse("http://rinfo.lagrummet.se/publ/rattsfall/nja/2004s43").get
    assert(nja.tpe == RATTSFALL && nja.attrs("sidnummer") == "43")
    val ad = LegalUri.rinfo
      .parse("http://rinfo.lagrummet.se/publ/rattsfall/ad/2004:43").get
    assert(ad.tpe == RATTSFALL && ad.attrs("lopnummer") == "43")
    // legaluri.py:60-62 — the MYNDIGHETSBESLUT (beslut/…) pattern
    val jk = LegalUri.rinfo
      .parse("http://rinfo.lagrummet.se/publ/beslut/jk/1075-02-40").get
    assert(jk.tpe == MYNDIGHETSBESLUT &&
      jk.attrs == Map("myndighet" -> "jk", "dnr" -> "1075-02-40"))
    // construct outputs parse back too (rf/…, avg/…)
    assert(LegalUri.rinfo
      .parse("http://rinfo.lagrummet.se/publ/rf/nja/2004/s_43").get
      .attrs("sidnummer") == "43")
  }

  test("construct∘parse = identity over the engine's minted URI space") {
    val base = graft.kg.EntityDict.base
    val uris = Seq(
      s"$base/sfs/1957:207",
      s"$base/sfs/1998:204#K12P10S2",
      s"$base/sfs/1998:204#K6",
      s"$base/sfs/1998:204#P4",
      s"$base/sfs/1998:204#P4S3N2",
      s"$base/sfs/1998:204#L1999:175",
      s"$base/dom/nja/1990s55",
      s"$base/dom/ad/2004:43",
      s"$base/dom/ra/2007/not/19",
      s"$base/avg/arn/1997-2279",
      s"$base/avg/jo/6810-2012",
      s"$base/avg/jk/2455-03-21",
      s"$base/prop/1995/96:45",
      s"$base/prop/1995/96:45#sid123",
      s"$base/sou/1998:44",
      s"$base/bet/2005/06:JuU22",
      s"$base/ext/celex/31995L0046",
      s"$base/ext/celex/31994R1488#5")
    uris.foreach { u =>
      val p = LegalUri.graft.parse(u)
      assert(p.isDefined, s"unparseable: $u")
      assert(LegalUri.graft.construct(p.get) == u,
        s"$u -> ${p.get} -> ${LegalUri.graft.construct(p.get)}")
    }
  }

  test("parse∘construct = identity over a seeded attribute space") {
    val r = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val p = r.nextInt(5) match {
        case 0 =>
          val frag = Seq("chapter" -> (1 + r.nextInt(20)).toString,
            "section" -> (1 + r.nextInt(40)).toString,
            "piece" -> (1 + r.nextInt(5)).toString,
            "item" -> (1 + r.nextInt(9)).toString).filter(_ => r.nextBoolean())
          Parsed(LAGRUM, (Seq(
            "law" -> s"${1950 + r.nextInt(70)}:${100 + r.nextInt(900)}") ++
            frag).toMap)
        case 1 =>
          if (r.nextBoolean())
            Parsed(RATTSFALL, Map("publikation" -> "nja",
              "arsutgava" -> (1985 + r.nextInt(35)).toString,
              "sidnummer" -> (1 + r.nextInt(900)).toString))
          else
            Parsed(RATTSFALL, Map("publikation" -> "ad",
              "arsutgava" -> (1985 + r.nextInt(35)).toString,
              "lopnummer" -> (1 + r.nextInt(150)).toString))
        case 2 =>
          Parsed(MYNDIGHETSBESLUT, Map(
            "myndighet" -> Seq("arn", "jo", "jk")(r.nextInt(3)),
            "dnr" -> s"${1000 + r.nextInt(9000)}-${1990 + r.nextInt(30)}"))
        case 3 =>
          val y = 1990 + r.nextInt(30)
          Parsed(FORARBETEN, (Map("serie" -> "prop",
            "arsutgava" -> f"$y/${(y + 1) % 100}%02d",
            "lopnummer" -> (1 + r.nextInt(200)).toString) ++
            (if (r.nextBoolean())
              Map("sidnummer" -> (10 + r.nextInt(300)).toString)
            else Map.empty)))
        case _ =>
          Parsed(EULAGSTIFTNING, (Map(
            "celex" -> f"3${1975 + r.nextInt(35)}L${1 + r.nextInt(150)}%04d") ++
            (if (r.nextBoolean())
              Map("artikel" -> (1 + r.nextInt(25)).toString)
            else Map.empty)))
      }
      val u = LegalUri.graft.construct(p)
      val back = LegalUri.graft.parse(u)
      assert(back.contains(p), s"$p -> $u -> $back")
    }
  }
}
