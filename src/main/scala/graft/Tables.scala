package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's fixed Parquet tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. Schemas are
  * documented in FIXTURES.md §A; `events.ts` is ns-precision parquet which
  * Spark reads truncated to µs — queries that must hash-match the DuckDB
  * oracle therefore expose timestamps as epoch-microsecond longs
  * (`unix_micros`), never raw timestamp columns (SURVEY.md §7.5.1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet outright
      // (PARQUET_TYPE_ILLEGAL); read nanos as a long and truncate to a
      // µs timestamp with integer division (`div`, not `/` — the epoch-ns
      // magnitude ~1.7e18 exceeds double's 2^53 exact-integer range).
      // DuckDB reads the same column as TIMESTAMP (µs, truncated), so both
      // engines see identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
