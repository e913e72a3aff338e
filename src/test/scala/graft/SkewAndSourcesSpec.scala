package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Skew-salting correctness on genuinely skewed data + generic file-source
  * round-trips (SURVEY §2.1 CSV/JSON source coverage). */
class SkewAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("salted distinct count equals plain countDistinct on a hot key") {
    // hot key: one user with 50k values (1% distinct), cold keys tiny
    val hot = (0 until 50000).map(i => ("hot", i % 500))
    val cold = (0 until 100).map(i => (s"cold${i % 7}", i))
    val df = (hot ++ cold).toDF("key", "v")
    val salted = Skew.saltedDistinctCount(df, col("key"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("key").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === exact)
    assert(salted("hot") === 500L)
  }

  test("csv and json sources round-trip the events slice") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src").toString
    val src = Tables(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    src.write.mode("overwrite").json(s"$tmp/json")

    val csv = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/csv")
    val json = spark.read.schema(src.schema).json(s"$tmp/json")
    assert(csv.count() === src.count())
    assert(json.count() === src.count())
    // value-level: checksum of a stable projection matches across formats
    // bit_xor: order-independent and overflow-free (ANSI sum of hashes throws)
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("event_id"), col("user_id"), col("event_type")))).head().getLong(0)
    assert(sig(csv) === sig(src))
    assert(sig(json) === sig(src))
  }
}
