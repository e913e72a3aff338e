package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the driver fixtures, for measuring the
  * heavy operators' growth exponents (VERDICT r10 task 1: convert the
  * "argued sub-quadratic" 100 TB story into a number).
  *
  * The scaling model is INDEPENDENT SHARDS: copy k of a table gets its
  * own disjoint key space (ids offset by k·(max+1)) and — where content
  * drives join/candidate structure — its own disjoint content space, so
  * each shard's internal duplicate/match/co-purchase structure is
  * identical to the original and nothing matches ACROSS shards. That is
  * how a real N×-bigger corpus behaves (N× the dup groups at the same
  * dup rate, N× the linkage blocks at the same block size), unlike naive
  * row duplication, whose repeated content makes every banded bucket and
  * every linkage block a quadratic hub — measuring the generator, not
  * the operator. Concretely:
  *
  *  - documents: doc_id offset; every word suffixed with the shard tag
  *    (per-shard vocabulary → shingle/fingerprint spaces disjoint);
  *    n_chars recomputed.
  *  - events: event_id/user_id offset; ts shifted 30 days per shard
  *    (per-minute load and per-user session structure stay constant).
  *  - customer: custkey offset; nationkey offset by 25 per shard — the
  *    linkage BLOCK space scales with the data (the "finer block key"
  *    a production linkage deploys), so blocks multiply while block
  *    SIZE stays constant.
  *  - orders/lineitem: order/cust/part/supp keys offset consistently
  *    (per-shard basket and co-purchase structure identical).
  *  - nation/part/supplier: REPLICATED with the same per-shard key
  *    offsets their fact-side FKs get (ADVICE r11: pass-through dims
  *    left shards k>0 with dangling l_partkey/l_suppkey/c_nationkey, so
  *    any dim join would have measured a constant-size output and
  *    reported a falsely flat exponent). Offsets come from the DIM's own
  *    key max (≥ the fact side's, so shard key ranges cannot collide).
  *  - embeddings: vec_id offset; dimension perturbed by a tiny
  *    shard-specific delta so shards aren't mutual near-dups.
  *  - region: copied through (nation keeps n_regionkey — 5 bounded
  *    regions stay a bounded broadcast dim at any scale).
  *
  * Optional 4th arg — a fixture MODE on top of the scale-up:
  *  - `hotkey`: one bot user owns 30% of all events (`event_id%10<3` →
  *    user_id 0 across every shard) — the skewed window/group load for
  *    the sessionizer skew measurements (VERDICT r11 task 6).
  *  - `vocab[:V]` (default V=50000): every word occurrence in documents
  *    is rewritten to a deterministic token drawn from a V-word space
  *    (`t<murmur3(doc_id,pos,w) mod V>`) — tokenizer-training stress at
  *    realistic vocabulary scale (VERDICT r11 task 8); the per-shard
  *    suffix still applies for copies > 1, so vocab stays ∝ shards.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <copies> [mode]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val mode = args.lift(3).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies, mode)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int,
               mode: String = ""): Unit = {
    def t(name: String): DataFrame = graft.Tables(spark, src, name)
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def shards(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => f(df, k)).reduce(_ unionAll _)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(t("region"), "region") // bounded dim: pass through

    val nat = t("nation")
    write(shards(nat) { (df, k) =>
      df.withColumn("n_nationkey", col("n_nationkey") + lit(k * 25L))
    }, "nation")

    val ev = t("events")
    val (evOff, uOff) = (off(ev, "event_id"), off(ev, "user_id"))
    write(shards(ev) { (df, k) =>
      val scaled = df
        .withColumn("event_id", col("event_id") + lit(k * evOff))
        .withColumn("user_id", col("user_id") + lit(k * uOff))
        .withColumn("ts", timestamp_micros(
          unix_micros(col("ts")) + lit(k * 30L * 86400L * 1000000L)))
      if (mode == "hotkey")
        scaled.withColumn("user_id",
          when(col("event_id") % 10 < 3, lit(0L)).otherwise(col("user_id")))
      else scaled
    }, "events")

    val vocabSize: Option[Int] = mode.split(":", 2) match {
      case Array("vocab") => Some(50000)
      case Array("vocab", v) => Some(v.toInt)
      case _ => None
    }
    val doc0 = t("documents")
    val doc = vocabSize match {
      case Some(v) =>
        val txt = expr("array_join(transform(split(text, ' '), " +
          s"(w, i) -> concat('t', pmod(hash(doc_id, i, w), $v))), ' ')")
        doc0.withColumn("text", txt).withColumn("n_chars",
          length(col("text")).cast("long"))
      case None => doc0
    }
    val dOff = off(doc, "doc_id")
    write(shards(doc) { (df, k) =>
      val txt =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$k")
      df.withColumn("doc_id", col("doc_id") + lit(k * dOff))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }, "documents")

    // Per-shard SIGNED CYCLIC ROTATION (not an additive delta): a signed
    // permutation is orthogonal, so every within-shard dot product,
    // norm, and neighbor structure is EXACTLY the original's, while
    // cross-shard cosines decorrelate to ~0 on these random vectors —
    // the embeddings analogue of documents' per-shard vocabulary. The
    // r12-era additive +k·1e-4 was measured in r13 to make shards
    // MUTUAL NEAR-DUPS (cos(v, v+δ) ≈ 1), so every banded pair query's
    // 10× run measured the output-quadratic degenerate corpus (every
    // vector in a 10-copy dup group; q_cosine_lsh_affine 4.3 → 190.7 s),
    // not the operator's plan. r13's plain rotation (offset 7k mod 64)
    // was unique only for k < 64 — shard 64 would DUPLICATE shard 0
    // exactly, re-degenerating the 100× fixture — so r14 adds a
    // per-(shard, dim) sign flip from hash(k, i): sign patterns are
    // unique for any copy count, and the flip preserves within-shard
    // geometry exactly like the rotation does.
    val emb = t("embeddings")
    val eOff = off(emb, "vec_id")
    write(shards(emb) { (df, k) =>
      val r = (k * 7) % 64
      val rotExpr =
        if (r == 0) "embedding"
        else s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"
      val transformed =
        if (k == 0) expr(rotExpr)
        else expr(
          s"transform($rotExpr, (x, i) -> IF(pmod(hash($k, i), 2) = 0, x, -x))")
      df.withColumn("vec_id", col("vec_id") + lit(k * eOff))
        .withColumn("embedding", transformed)
    }, "embeddings")

    val cust = t("customer")
    val cOff = off(cust, "c_custkey")
    write(shards(cust) { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * cOff))
        .withColumn("c_nationkey", col("c_nationkey") + lit(k * 25L))
    }, "customer")

    val ord = t("orders")
    val oOff = off(ord, "o_orderkey")
    write(shards(ord) { (df, k) =>
      // hotkey: one bot CUSTOMER per shard owns 30% of orders (applied
      // before the key offset, so shard k's bot is k·cOff) — the
      // single-key quadratic basket the itemCf cap measurement needs,
      // the orders-side analogue of the events bot user above
      val skewed =
        if (mode == "hotkey")
          df.withColumn("o_custkey",
            when(col("o_orderkey") % 10 < 3, lit(0L)).otherwise(col("o_custkey")))
        else df
      skewed.withColumn("o_orderkey", col("o_orderkey") + lit(k * oOff))
        .withColumn("o_custkey", col("o_custkey") + lit(k * cOff))
    }, "orders")

    // dim-keyed offsets (not the fact side's max) so shard key ranges
    // can't collide; the SAME offset is applied to lineitem's FKs below
    val part = t("part")
    val pOff = off(part, "p_partkey")
    write(shards(part) { (df, k) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(k * pOff))
    }, "part")

    val supp = t("supplier")
    val sOff = off(supp, "s_suppkey")
    write(shards(supp) { (df, k) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(k * sOff))
        .withColumn("s_nationkey", col("s_nationkey") + lit(k * 25L))
    }, "supplier")

    val li = t("lineitem")
    write(shards(li) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * oOff))
        .withColumn("l_partkey", col("l_partkey") + lit(k * pOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * sOff))
    }, "lineitem")

    val tag = if (mode.isEmpty) "" else s" (mode=$mode)"
    println(s"[scalegen] wrote ${copies}x of $src to $out$tag")
  }
}
