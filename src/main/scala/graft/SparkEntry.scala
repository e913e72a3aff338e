package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.elb.ElbQueries
import graft.ops.{AffineSketch, Analytics, Audit, Curation, EventOps, Lakehouse, MlPrep, Multimodal, Relational, SessionQueries, TextOps, VectorOps}
import graft.stream.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's registry; each entry has an
  * exact DuckDB twin in `oracleSql` (same column names/order-determinism on
  * both sides) unless the operation is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full sessionization pipeline (reference Goal 1, README.md:9-10). */
  def entry(spark: SparkSession): DataFrame =
    SessionQueries.sessionize(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SessionQueries.queries ++ Relational.queries ++ EventOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ ElbQueries.queries ++
      Multimodal.queries ++ Curation.queries ++ Analytics.queries ++
      Audit.queries ++ AffineSketch.queries ++ MlPrep.queries ++
      StreamQueries.queries ++ Lakehouse.queries

  /** Every rows-only query (no `oracleSql` entry — engine-native hashes or
    * float-ordered fits have no DuckDB twin) mapped to the fully
    * hash-oracled deterministic twin that proves the same pipeline shape.
    * EntrySpec asserts this map covers the rows-only set EXACTLY, so a
    * future rows-only query without a committed twin fails loudly. */
  val rowsOnlyTwins: Map[String, String] = Map(
    "q_minhash_candidates" -> "q_minhash_affine",
    "q_simhash_pairs" -> "q_simhash_affine",
    "q_winnow_fingerprints" -> "q_winnow_affine",
    "q_cosine_pairs_lsh" -> "q_cosine_lsh_affine",
    "q_kmv_users" -> "q_kmv_users_affine",
    "q_approx_distinct" -> "q_hll_affine",
    "q_approx_percentile" -> "q_sample_percentile")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SessionQueries.oracleSql ++ Relational.oracleSql ++ EventOps.oracleSql ++
      TextOps.oracleSql ++ VectorOps.oracleSql ++ ElbQueries.oracleSql ++
      Multimodal.oracleSql ++ Curation.oracleSql ++ Analytics.oracleSql ++
      Audit.oracleSql ++ AffineSketch.oracleSql ++ MlPrep.oracleSql ++
      StreamQueries.oracleSql ++ Lakehouse.oracleSql
}
