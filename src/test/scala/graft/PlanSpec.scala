package graft

/** Plan-shape regression guards (SURVEY §4, COVERAGE plan notes): the
  * optimizations the 100 TB story depends on must stay visible in the
  * physical plan — broadcast choice, pushdown/pruning, single-exchange
  * sessionization, top-k without global sort. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("broadcast star join actually broadcasts both dims") {
    val p = plan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).length === 2, p.take(2000))
  }

  test("sessionize uses ONE data exchange for window + aggregate") {
    // hash-by-user exchange reused by both windows and the group-by; the
    // only other exchange is the final orderBy range partitioning
    val p = plan("q_sessionize")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
      .r.findAllIn(p).toList
    val hashEx = exchanges.count(_.contains("hashpartitioning"))
    assert(hashEx === 1, s"expected 1 hash exchange, got $hashEx:\n${p.take(3000)}")
  }

  test("parquet scan prunes columns and pushes filters") {
    val p = plan("q_string_funcs")
    assert(p.contains("PushedFilters: [IsNotNull(p_name)]"), p.take(2000))
    // 4 of 6 part columns read
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string>"),
      p.take(2000))
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("dot product runs as the native codegen expression") {
    val p = plan("q_vector_norms")
    assert(p.contains("dotproduct") || p.contains("DotProduct"), p.take(2000))
  }

  test("dedup pipelines force no broadcast (O(N) relations; AQE decides)") {
    // the signature/count relations are corpus-sized — a broadcast() hint
    // on them is a driver-killer at 100 TB; joins must be plain equi joins
    // (AQE may still broadcast at runtime when genuinely small)
    Seq("q_jaccard_pairs", "q_minhash_candidates", "q_simhash_pairs").foreach { q =>
      val opt = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.optimizedPlan.toString
      assert(!opt.contains("strategy=broadcast"), s"$q forces broadcast:\n${opt.take(2000)}")
      spark.catalog.clearCache()
    }
  }

  test("range join keeps the equi conjunct (hash join, not BNLJ)") {
    val p = plan("q_join_range")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
