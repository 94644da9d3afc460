package graft.kg

import graft.model.Vocab
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Precision/recall of an emitted triple set against the ground-truth set
  * (BASELINE.json gate: P/R >= 0.95 vs reference triples). Comparison is
  * set-based over the full statement identity — (subj, pred, obj,
  * objIsLiteral, objDatatype, objLang, graph) — mirroring the reference's
  * graph-isomorphism comparison (assertEqualGraphs,
  * /root/reference/ferenda/testutil.py:58-116; no bnodes in our fixtures so
  * plain set equality is exact).
  *
  * Pipeline-provenance triples (prov:*) are excluded — they are our own
  * lineage markers, not reference semantics.
  */
object Scoring {

  final case class Prf(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
  }

  private val keyCols =
    Seq("subj", "pred", "obj", "objIsLiteral", "objDatatype", "objLang", "graph")

  private def norm(df: DataFrame): DataFrame =
    df.filter(!col("pred").startsWith(Vocab.PROV))
      .select(keyCols.map(col): _*)
      // equi-joins treat NULL = NULL as false; empty string is not a legal
      // datatype/lang so the sentinel is collision-free
      .na.fill("", Seq("objDatatype", "objLang"))
      .dropDuplicates()

  def score(actual: DataFrame, expected: DataFrame): Prf = {
    val a = norm(actual).persist()
    val e = norm(expected).persist()
    val tp = a.join(e, keyCols, "left_semi").count()
    val fp = a.join(e, keyCols, "left_anti").count()
    val fn = e.join(a, keyCols, "left_anti").count()
    a.unpersist(); e.unpersist()
    Prf(tp, fp, fn)
  }

  /** The disagreeing triples, labeled — the debugging view. */
  def diff(actual: DataFrame, expected: DataFrame): DataFrame = {
    val a = norm(actual)
    val e = norm(expected)
    a.join(e, keyCols, "left_anti").withColumn("side", lit("actual_only"))
      .unionByName(
        e.join(a, keyCols, "left_anti").withColumn("side", lit("expected_only")))
  }
}
