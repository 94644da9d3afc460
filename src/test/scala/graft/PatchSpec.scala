package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Patch

/** Unified-diff engine: constructed-edit round-trips (apply(diff(a→b), a)
  * must equal b exactly), multi-hunk ordering, fuzz adjustment bounds. */
class PatchSpec extends AnyFunSuite {

  /** Build a unified diff for "replace lines [at, at+del) with `ins`",
    * with `ctx` context lines — a generator, so the test never trusts the
    * engine to check itself. */
  private def hunkFor(src: IndexedSeq[String], at: Int, del: Int,
                      ins: Seq[String], ctx: Int = 2,
                      comment: String = ""): String = {
    val cBefore = math.max(0, at - ctx)
    val cAfter = math.min(src.length, at + del + ctx)
    val body = new StringBuilder
    (cBefore until at).foreach(i => body.append(" " + src(i) + "\n"))
    (at until at + del).foreach(i => body.append("-" + src(i) + "\n"))
    ins.foreach(l => body.append("+" + l + "\n"))
    (at + del until cAfter).foreach(i => body.append(" " + src(i) + "\n"))
    val srcLen = cAfter - cBefore
    val dstLen = srcLen - del + ins.size
    s"@@ -${cBefore + 1},$srcLen +${cBefore + 1},$dstLen @@ $comment\n" + body
  }

  private def applyEdit(src: IndexedSeq[String], at: Int, del: Int,
                        ins: Seq[String]): IndexedSeq[String] =
    src.take(at) ++ ins ++ src.drop(at + del)

  test("random single-hunk round-trips (200 seeded cases)") {
    val rnd = new scala.util.Random(99)
    (0 until 200).foreach { k =>
      val n = 5 + rnd.nextInt(40)
      val src = (0 until n).map(i => s"line $i ${rnd.nextInt(1000)}")
      val at = rnd.nextInt(n)
      val del = rnd.nextInt(math.min(4, n - at))
      val ins = (0 until rnd.nextInt(4)).map(j => s"new $k-$j")
      val want = applyEdit(src, at, del, ins).mkString("\n")
      val patch = hunkFor(src, at, del, ins)
      val (got, _) = Patch.apply(src.mkString("\n"), patch)
      assert(got == want, s"case $k: at=$at del=$del ins=${ins.size}")
    }
  }

  test("multiple hunks apply in order; comment carried as description") {
    val src = (0 until 30).map(i => s"row $i")
    val e1 = applyEdit(src, 3, 1, Seq("patched three"))
    val e2 = applyEdit(e1, 20, 2, Seq("twenty", "twenty-one"))
    val patch = hunkFor(src, 3, 1, Seq("patched three"), comment = "fix 3") +
      hunkFor(src, 20, 2, Seq("twenty", "twenty-one"))
    val (got, desc) = Patch.apply(src.mkString("\n"), patch)
    assert(got == e2.mkString("\n"))
    assert(desc.contains("fix 3"))
  }

  test("fuzz: shifted hunk headers still apply; beyond-fuzz conflicts") {
    val src = (0 until 60).map(i => s"item $i")
    val patch = hunkFor(src, 30, 1, Seq("ITEM 30"))
    // shift the header by -7: the context match drifts but succeeds
    val shifted = patch.replaceFirst("@@ -29,5 \\+29,5 @@", "@@ -22,5 +22,5 @@")
    assert(Patch.apply(src.mkString("\n"), shifted)._1.contains("ITEM 30"))
    // conflicting context never applies
    val bad = "@@ -1,1 +1,1 @@\n-does not exist\n+x\n"
    intercept[Patch.PatchConflict](Patch.apply(src.mkString("\n"), bad))
  }

  test("empty context lines in the diff body are tolerated") {
    val src = IndexedSeq("a", "", "b")
    val patch = "@@ -1,3 +1,3 @@\n a\n\n-b\n+B\n" // blank line = blank context
    assert(Patch.apply(src.mkString("\n"), patch)._1 == "a\n\nB")
  }

  test("body content starting with '-'/'+' is body, not a file header") {
    // deleting a SQL '-- comment' produces a '--- comment' diff line; the
    // r2 parser misread it as a file header and silently dropped it
    // (ADVICE r2) — the srcLen/dstLen-delimited parser must keep it
    val src = IndexedSeq("SELECT 1;", "-- old comment", "++x", "SELECT 2;")
    val want = IndexedSeq("SELECT 1;", "++y", "SELECT 2;")
    val patch =
      "@@ -1,4 +1,3 @@\n SELECT 1;\n--- old comment\n-++x\n+++y\n SELECT 2;\n"
    val (got, _) = Patch.apply(src.mkString("\n"), patch)
    assert(got == want.mkString("\n"))
  }

  test("random round-trips with '-'/'+'-prefixed content (seeded)") {
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("-- c", "++ d", "--- e", "+++ f", "plain", "-x", "+y")
    (0 until 100).foreach { k =>
      val n = 5 + rnd.nextInt(20)
      val src = (0 until n).map(i => s"${alphabet(rnd.nextInt(alphabet.size))} $i")
      val at = rnd.nextInt(n)
      val del = rnd.nextInt(math.min(4, n - at))
      val ins = (0 until rnd.nextInt(4))
        .map(j => s"${alphabet(rnd.nextInt(alphabet.size))} new$j")
      val want = applyEdit(src, at, del, ins).mkString("\n")
      val (got, _) = Patch.apply(src.mkString("\n"), hunkFor(src, at, del, ins))
      assert(got == want, s"case $k")
    }
  }

  test("truncated hunk (missing body lines) conflicts instead of misparsing") {
    val bad = "@@ -1,3 +1,3 @@\n a\n@@ -5,1 +5,1 @@\n-q\n+r\n"
    intercept[Patch.PatchConflict](Patch.apply("a\nb\nc\nd\nq", bad))
  }

  test("excess body lines beyond the declared counts conflict loudly") {
    // the hunk declares 1+1 lines but carries an extra '+' — the silent
    // drop would apply 'successfully' missing a line
    val bad = "@@ -1,1 +1,1 @@\n-old\n+new\n+new2\n"
    intercept[Patch.PatchConflict](Patch.apply("old\nrest", bad))
    // preamble before the first hunk stays permissive (git mail headers)
    val ok = "From: someone\nSubject: fix\n\n@@ -1,1 +1,1 @@\n-old\n+new\n"
    assert(Patch.apply("old\nrest", ok)._1 == "new\nrest")
  }

  test("one-sided overdraw while the hunk is still open conflicts (ADVICE r3)") {
    // declares 1 source line but carries two '-' while '+' side keeps the
    // hunk open — the old check only fired after BOTH counters were spent,
    // so srcLeft went negative and the overdraw applied silently
    val badMinus = "@@ -1,1 +1,2 @@\n-a\n-b\n+x\n+y\n"
    intercept[Patch.PatchConflict](Patch.apply("a\nb\nc", badMinus))
    val badPlus = "@@ -1,2 +1,1 @@\n-a\n+x\n+y\n-b\n"
    intercept[Patch.PatchConflict](Patch.apply("a\nb\nc", badPlus))
    // a context line with one counter at 0 is an overdraw too
    val badCtx = "@@ -1,1 +1,2 @@\n-a\n+x\n y\n+z\n"
    intercept[Patch.PatchConflict](Patch.apply("a\ny\nc", badCtx))
  }
}
