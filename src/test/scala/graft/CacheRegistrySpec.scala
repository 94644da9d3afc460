package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Regression pins for the shared cache registry, in particular the
  * memoTrack nesting bug: computeIfAbsent threw the JDK's "Recursive
  * update" (intermittently, bin-dependent) when a build recursively
  * memoized ANOTHER key — exactly what dedup-apply's pair table does via
  * the shingle index and SemDeDup's via the normed table. */
class CacheRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-cacheregistry-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("memoTrack tolerates nested builds (the Recursive update bug)") {
    import spark.implicits._
    CacheRegistry.release()
    var innerBuilds = 0
    def inner() = CacheRegistry.memoTrack("nested-inner", spark, "t") {
      innerBuilds += 1
      Seq(1, 2, 3).toDF("x")
    }
    // many outer keys so some land in the inner key's hash bin — the
    // computeIfAbsent version threw IllegalStateException here
    (0 until 64).foreach { i =>
      CacheRegistry.memoTrack(s"nested-outer-$i", spark, "t") {
        inner().selectExpr("x + 1 AS y")
      }
    }
    assert(innerBuilds == 1, "inner build memoized across outer builds")
    assert(CacheRegistry.trackedCount == 65)
    CacheRegistry.release()
  }

  test("memoTrack returns the same frame per key and rebuilds after release") {
    import spark.implicits._
    CacheRegistry.release()
    var builds = 0
    def get() = CacheRegistry.memoTrack("memo-key", spark, "dirA") {
      builds += 1
      Seq("a").toDF("s")
    }
    val first = get()
    assert(get() eq first)
    assert(builds == 1)
    // a different (tag, dir) is a different entry
    CacheRegistry.memoTrack("memo-key", spark, "dirB") { Seq("b").toDF("s") }
    assert(builds == 1)
    CacheRegistry.release()
    assert(get() ne first) // memo cleared with the registry
    assert(builds == 2)
    CacheRegistry.release()
  }
}
