package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the SparkSessionExtensions injection path must resolve
  * the native functions from plain SQL text with no imperative
  * registration. Separate session builder on purpose. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft_* functions from SQL") {
    // getOrCreate reuses any live session and would IGNORE the extensions —
    // force a fresh context (later suites lazily recreate their own)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(dot === 32.0)
      val ham = spark.sql(
        "SELECT graft_sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 4L)) AS a")
        .head().getDouble(0)
      assert(ham === 0.75)
      val sh = spark.sql(
        "SELECT graft_bigram_shingles(array('a', 'b', 'a', 'b')) AS s")
        .head().getSeq[String](0)
      assert(sh === Seq("a b", "b a"))

      // injected optimizer rule: bounded-levenshtein predicates grow a free
      // length-difference gate, and results are unchanged
      import spark.implicits._
      // parquet round-trip: a pure LocalRelation would be constant-folded
      // by ConvertToLocalRelation and the filter would vanish entirely
      val tmp = java.nio.file.Files.createTempDirectory("graft_lev").toString
      Seq(
        ("kitten", "sitting"),   // lev 3, len diff 1 → kept by <= 3
        ("kitten", "kitten"),    // lev 0 → kept
        ("a", "abcdefgh"),       // len diff 7 → gate rejects before DP
        ("abc", "xyzabc"))       // lev 3 (3 inserts) → kept
        .toDF("t1", "t2")
        .write.mode("overwrite").parquet(s"$tmp/pairs")
      spark.read.parquet(s"$tmp/pairs").createOrReplaceTempView("pairs_v")
      val q = spark.sql(
        "SELECT t1, t2 FROM pairs_v WHERE levenshtein(t1, t2) <= 3")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("abs((length(t1"),
        s"length gate not injected:\n$optimized")
      val rows = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows === Set(("kitten", "sitting"), ("kitten", "kitten"),
        ("abc", "xyzabc")))
      // idempotent under the fixpoint batch: exactly one gate, not many
      val gateCount = "abs\\(\\(length\\(t1".r
        .findAllIn(optimized.toLowerCase).length
      assert(gateCount === 1, s"rule re-added gates:\n$optimized")
    } finally spark.stop() // this suite's session must not leak its catalog
  }
}
