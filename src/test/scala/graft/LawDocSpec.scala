package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.Corpus
import graft.model.Vocab
import graft.parse.LawDoc

/** The Swedish-law family end-to-end at the unit level: every generated
  * document parses, and the parsed mention targets match the generator's
  * ground truth EXACTLY (P = R = 1.0) — including the anaphoric
  * "samma lag" back-references that force per-document state. Ground
  * truth is produced by Corpus.lawDoc from its template variables,
  * independent of the parser (the same P/R-oracle pattern as the other
  * three families). */
class LawDocSpec extends AnyFunSuite {

  private val M = 60L
  private val Seed = 42L

  private lazy val docs = (0L until M).map(Corpus.lawDoc(Seed, _, M))

  test("övergångsbestämmelser tails parse as structure, not citations") {
    val parsed = docs.map(d => LawDoc.parse(d.src))
    val withTail = parsed.filter(_.bodyXml.contains("<Overgangsbestammelser"))
    assert(withTail.nonEmpty, "no law docs carry the obs tail")
    withTail.foreach { p =>
      // amendment-id lines become sfsnr attributes (bare-id match texts
      // do occur legitimately in BODY citations like "lagen (1963:113)";
      // a tail id leaking into the scan would be an extra mention not in
      // the generator truth, which the P/R=1.0 test below rejects)
      assert(p.bodyXml.contains("sfsnr=\""))
      assert(!p.bodyXml.contains("<Overgangsbestammelser></Overgangsbestammelser>"),
        "tail containers must carry their bestämmelse children")
    }
    assert(parsed.exists(_.bodyXml.contains("<Bilaga")),
      "no law docs carry a bilaga")
  }

  test("law corpus: names unique, dictionary covers them, P/R = 1.0") {
    val names = (0L until Corpus.MaxLaws).map(Corpus.lawNameOf)
    assert(names.distinct.size == names.size)

    var tp = 0; var fp = 0; var fn = 0
    docs.foreach { d =>
      val parsed = LawDoc.parse(d.src)
      // (anchor section, target) pairs — mentions must anchor at their
      // enclosing #K..P.. sub-resource, not just hit the right target
      val got = parsed.mentions.map(m => (m.subjUri, m.candidateKey)).toSet
      val want = d.truth.filter(_.pred == Vocab.dcterms("references"))
        .map(t => (t.subj, t.obj)).toSet
      tp += (got & want).size
      fp += (got -- want).size
      fn += (want -- got).size
      assert((got -- want).isEmpty && (want -- got).isEmpty,
        s"${d.src.path}:\n extra=${got -- want}\n missing=${want -- got}" +
          s"\n content:\n${d.src.content}")
    }
    info(s"law-family mention P/R: tp=$tp fp=$fp fn=$fn")
    assert(fp == 0 && fn == 0)
  }

  test("statute structure triples match the generator's truth exactly") {
    val structPreds = Set(Vocab.RDF_TYPE, Vocab.dcterms("isPartOf"),
      Vocab.rpubl("kapitelnummer"), Vocab.rpubl("paragrafnummer"))
    def structOf(ts: Seq[graft.model.Triple]) = ts
      .filter(t => t.subj.contains("#K") && structPreds.contains(t.pred))
      .map(t => (t.subj, t.pred, t.obj)).toSet
    docs.foreach { d =>
      val got = structOf(LawDoc.parse(d.src).triples)
      val want = structOf(d.truth)
      assert(got == want,
        s"${d.src.path}:\n extra=${got -- want}\n missing=${want -- got}" +
          s"\n content:\n${d.src.content}")
      assert(want.nonEmpty)
      // every section chains to its chapter, every chapter to the law
      val isPartOf = LawDoc.parse(d.src).triples
        .filter(_.pred == Vocab.dcterms("isPartOf"))
        .map(t => t.subj -> t.obj).toMap
      isPartOf.foreach { case (child, parent) =>
        if (child.contains("P"))
          assert(parent.contains("#K") && child.startsWith(parent))
        else assert(parent == LawDoc.base + LawDoc.sfsIdFromPath(d.src.path))
      }
    }
  }

  test("bare section refs resolve against the enclosing chapter context") {
    // legalref.py:845-851 attribute completion: "14 §" inside 2 kap.
    // means 2 kap. 14 § — the target carries the ENCLOSING chapter
    val m = docs.flatMap(d => LawDoc.parse(d.src).mentions)
      .filter(x => x.grammar == "LawRef" && !x.matchText.contains("kap"))
    val ctxResolved =
      m.filter(_.candidateKey.matches(".*/sfs/[^#]+#K\\d+P\\d+$"))
    assert(ctxResolved.nonEmpty, "no context-resolved bare section refs")
    ctxResolved.foreach { x =>
      val ownLaw = x.subjUri.takeWhile(_ != '#')
      if (x.candidateKey.startsWith(ownLaw + "#")) {
        val anchorKap = x.subjUri.replaceAll(".*#K(\\d+)P.*", "$1")
        assert(x.candidateKey.contains(s"#K${anchorKap}P"), x.toString)
      }
    }
  }

  test("anaphoric back-references are present and resolve to the cited law") {
    val anaphoric = docs.flatMap { d =>
      LawDoc.parse(d.src).mentions.filter(_.grammar == "LawRefSame")
    }
    assert(anaphoric.nonEmpty, "corpus must exercise 'samma lag'")
    anaphoric.foreach { m =>
      // each "N § samma lag" target points at ANOTHER law's section
      assert(m.candidateKey.contains("#P"))
      val ownId = LawDoc.sfsIdFromPath(m.docId.split("@").head)
      assert(!m.candidateKey.startsWith(LawDoc.base + ownId + "#"),
        s"anaphoric ref resolved to its own document: $m")
    }
  }

  test("all five citation families produce mentions over the law corpus") {
    val grammars = docs.flatMap(d => LawDoc.parse(d.src).mentions)
      .groupBy(_.grammar).view.mapValues(_.size).toMap
    assert(grammars.keySet == Set("LawRef", "LawRefSame", "ForarbRef",
      "RattsfallRef", "EuActRef", "AvgRef"), grammars.toString)
    // each family's targets live in their own URI space
    val m = docs.flatMap(d => LawDoc.parse(d.src).mentions)
    assert(m.exists(_.candidateKey.contains("/prop/")))
    assert(m.exists(_.candidateKey.contains("/sou/")))
    assert(m.exists(_.candidateKey.contains("/dom/nja/")))
    assert(m.exists(_.candidateKey.contains("/ext/celex/3")))
    assert(m.exists(_.candidateKey.contains("/ext/celex/3") &&
      m.exists(_.candidateKey.contains("#"))), "artikel fragment present")
    Seq("arn", "jo", "jk").foreach { series =>
      assert(m.exists(_.candidateKey.contains(s"/avg/$series/")),
        s"missing $series agency-decision mentions")
    }
    // KORTLAGRUM abbreviations resolve through the abbreviation
    // dictionary ("3 § MBL" style, legalref.py:268-281)
    assert(m.exists(_.matchText.matches("\\d+ § [A-Z]{2}L")),
      "no abbreviation (KORTLAGRUM) mentions in the corpus")
  }

  test("doc triples carry type/title/identifier in the sv-law shape") {
    val p = LawDoc.parse(docs.head.src)
    assert(p.triples.exists(t =>
      t.pred == Vocab.RDF_TYPE && t.obj == LawDoc.LawType))
    assert(p.triples.exists(t =>
      t.pred == Vocab.dcterms("identifier") && t.obj == Corpus.sfsIdOf(0)))
    assert(p.uri == LawDoc.base + Corpus.sfsIdOf(0))
    assert(p.title == docs.head.src.content.linesIterator.next().trim)
  }
}
