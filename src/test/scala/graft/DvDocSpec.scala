package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.Corpus
import graft.model.Vocab
import graft.parse.DvDoc

/** The court-verdict family end-to-end at the unit level: every generated
  * referat parses, mention (anchor, target) pairs and instance-structure
  * triples match the generator's independent ground truth exactly —
  * the same P/R-oracle pattern as the other four families. */
class DvDocSpec extends AnyFunSuite {

  private val M = 40L
  private val MLaws = 40L
  private val Seed = 42L

  private lazy val docs = (0L until M).map(Corpus.dvDoc(Seed, _, M, MLaws))

  test("dv corpus: mention anchors and targets, P/R = 1.0") {
    var tp = 0; var fp = 0; var fn = 0
    docs.foreach { d =>
      val parsed = DvDoc.parse(d.src)
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
    info(s"dv-family mention P/R: tp=$tp fp=$fp fn=$fn")
    assert(fp == 0 && fn == 0)
  }

  test("instance structure triples match the generator's truth exactly") {
    val structPreds = Set(Vocab.RDF_TYPE, Vocab.dcterms("isPartOf"),
      Vocab.dcterms("creator"), Vocab.rpubl("avgorandedatum"))
    def structOf(ts: Seq[graft.model.Triple]) = ts
      .filter(t => t.subj.contains("#I") && structPreds.contains(t.pred))
      .map(t => (t.subj, t.pred, t.obj)).toSet
    docs.foreach { d =>
      val got = structOf(DvDoc.parse(d.src).triples)
      val want = structOf(d.truth)
      assert(got == want,
        s"${d.src.path}:\n extra=${got -- want}\n missing=${want -- got}" +
          s"\n content:\n${d.src.content}")
      // both instances present, TR one always dated
      assert(got.exists(_._2 == Vocab.rpubl("avgorandedatum")))
    }
  }

  test("referat URIs are RattsfallRef-shaped and legaluri round-trips them") {
    docs.foreach { d =>
      val p = DvDoc.parse(d.src)
      assert(p.uri.matches(".*/dom/nja/\\d{4}s\\d+$"), p.uri)
      val back = graft.kg.LegalUri.graft.parse(p.uri)
      assert(back.exists(_.tpe == graft.kg.LegalUri.RATTSFALL), p.uri)
      assert(back.map(graft.kg.LegalUri.graft.construct).contains(p.uri))
      assert(p.triples.exists(t =>
        t.pred == Vocab.RDF_TYPE && t.obj == DvDoc.ReferatType))
    }
  }

  test("multi-part referats carry Delmal sub-resources with instance chains") {
    val withDelmal = docs.map(d => DvDoc.parse(d.src))
      .filter(_.triples.exists(_.subj.endsWith("#DII")))
    assert(withDelmal.nonEmpty, "no Delmal referats in the corpus")
    withDelmal.foreach { p =>
      // the second part's instance chains to the part, the part to the doc
      val isPartOf = p.triples.filter(_.pred == Vocab.dcterms("isPartOf"))
        .map(t => t.subj -> t.obj).toMap
      val dII = p.triples.find(_.subj.endsWith("#DII")).get.subj
      assert(isPartOf(dII) == p.uri)
      assert(isPartOf.exists { case (c, par) => par == dII && c.contains("#I") })
    }
  }

  test("dissents and addenda parse as Skiljaktig/Tillagg appendices") {
    def tags(n: graft.parse.TreeNode): Seq[String] =
      n.tag +: n.children.flatMap(tags)
    val allTags = docs.flatMap(d =>
      tags(graft.parse.TreeNode.fromXml(DvDoc.parse(d.src).bodyXml)))
    assert(allTags.contains("Skiljaktig"), "no dissent in the corpus")
    assert(allTags.contains("Tillagg"), "no addendum in the corpus")
  }

  test("in-corpus referat cross-citations resolve to minted referat URIs") {
    val minted = docs.map(d => DvDoc.parse(d.src).uri).toSet
    val crossCites = docs.flatMap(d => DvDoc.parse(d.src).mentions)
      .filter(m => m.grammar == "RattsfallRef" && minted.contains(m.candidateKey))
    assert(crossCites.nonEmpty, "no in-corpus referat cross-citations")
  }
}
