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
    } finally spark.stop() // this suite's session must not leak its catalog
  }
}
