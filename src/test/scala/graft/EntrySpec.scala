package graft

/** Driver-contract smoke: entry has rows; every declared query runs at
  * sf0.001 and yields a non-degenerate schema; every oracle key maps to a
  * real query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query runs at sf0.001 with columns and rows") {
    val empties = Seq("q_jaccard_pairs", "q_cosine_pairs",
      "q_minhash_candidates", "q_join_anti") // legitimately may be empty/small
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (!empties.contains(name))
        assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("multimodal decode stub roundtrips payload length") {
    val out = graft.ops.Multimodal.decode(spark, sf001).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val n = r.getInt(r.fieldIndex("n_bytes"))
      r.getInt(r.fieldIndex("width")) == 64 + n % 512 &&
        r.getInt(r.fieldIndex("n_frames")) == 1 + n % 24
    })
  }
}
