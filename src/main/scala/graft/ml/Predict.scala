package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sessionize

/** The reference's three MLE goals (/root/reference/README.md:18-23), thin
  * on MLlib: the engine's contribution is the relational feature pipelines
  * (oracle-checkable upstream); fit/predict is a plain MLlib regression.
  * Train/test MAE sanity is asserted in PredictSpec — models are not part
  * of the DuckDB-oracle surface (SURVEY §2.12).
  */
object Predict {

  /** Goal: "Predict the expected load (requests/second) in the next
    * minute" (R:19). Lag features over the per-minute series → linear
    * regression. Returns (model summary metrics DF, predictions DF). */
  def loadForecast(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val perMin = Tables(s, dir, "events")
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"))
    val w = Window.orderBy(col("minute_us"))
    val feats = perMin
      .withColumn("lag1", lag(col("requests"), 1).over(w))
      .withColumn("lag2", lag(col("requests"), 2).over(w))
      .withColumn("lag3", lag(col("requests"), 3).over(w))
      .withColumn("ma5", avg(col("requests")).over(w.rowsBetween(-5, -1)))
      .withColumn("label", col("requests").cast("double") / 60.0) // req/sec
      .na.drop()
    fitLinear(feats, Array("lag1", "lag2", "lag3", "ma5"))
  }

  /** Goal: "Predict the session length for a given IP" (R:21). */
  def sessionLength(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val feats = ipFeatures(s, dir)
      .withColumnRenamed("mean_duration_sec", "label")
    fitLinear(feats, Array("n_sessions", "total_hits", "mean_unique_urls"))
  }

  /** Goal: "Predict the number of unique URL visits by a given IP" (R:23). */
  def uniqueUrls(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val feats = ipFeatures(s, dir)
      .withColumnRenamed("mean_unique_urls", "label")
    fitLinear(feats, Array("n_sessions", "total_hits", "mean_duration_sec"))
  }

  /** Classification twin of the regressions (beyond-spec §2.12 depth):
    * per-user purchase-propensity — label = purchase share ≥ 0.2, features
    * from the NON-purchase behavior only (no leakage). LogisticRegression
    * + AUC via BinaryClassificationEvaluator; the synthetic generator
    * carries no real signal, so PredictSpec asserts pipeline mechanics
    * (deterministic split, finite AUC, both classes predicted), not lift —
    * same posture as the regression MAE sanity checks. */
  def purchasePropensity(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val spark = s
    val feats = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "view", 1)).cast("double").as("n_views"),
        count(when(col("event_type") === "click", 1)).cast("double").as("n_clicks"),
        count(when(col("event_type") === "error", 1)).cast("double").as("n_errors"),
        round(avg(when(col("event_type") =!= "purchase", col("value"))), 6)
          .as("avg_value"),
        (count(when(col("event_type") === "purchase", 1)).cast("double") /
          count(lit(1))).as("purchase_rate"))
      .withColumn("label", (col("purchase_rate") >= 0.2).cast("double"))
      .drop("purchase_rate")
      .na.drop()

    val keyed = feats.withColumn("_fold", pmod(xxhash64(col("user_id")), lit(5)))
    val train = keyed.filter(col("_fold") =!= 0)
    val test = keyed.filter(col("_fold") === 0)
    val asm = new VectorAssembler()
      .setInputCols(Array("n_views", "n_clicks", "n_errors", "avg_value"))
      .setOutputCol("features")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25).setRegParam(0.01)
    val fitted = lr.fit(asm.transform(train))
    // Persistence round-trip, and not only for coverage: the freshly
    // fitted model carries a trainingSummary that references the
    // SparkSession (non-serializable ObservationManager inside), and
    // transform()'s prediction UDF captures the whole model — the loaded
    // copy is summary-free and safely serializable into task closures.
    val modelDir = java.nio.file.Files.createTempDirectory("graft_lr").toString
    fitted.write.overwrite().save(modelDir)
    val model =
      org.apache.spark.ml.classification.LogisticRegressionModel.load(modelDir)
    val preds = model.transform(asm.transform(test))
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(preds)
    import spark.implicits._
    val metrics = Seq(("auc", auc),
      ("n_train", train.count().toDouble),
      ("n_test", test.count().toDouble)).toDF("metric", "value")
    (metrics, preds.select("user_id", "label", "prediction", "probability"))
  }

  private def ipFeatures(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("n_sessions"),
        avg(col("duration_sec")).as("mean_duration_sec"),
        avg(col("unique_item_count")).as("mean_unique_urls"),
        sum(col("hit_count")).cast("double").as("total_hits"))

  /** Deterministic 80/20 split (hash of first column), assemble, fit,
    * evaluate — returns (metrics, test predictions). */
  private def fitLinear(feats: DataFrame, cols: Array[String]): (DataFrame, DataFrame) = {
    val spark = feats.sparkSession
    import spark.implicits._
    val keyed = feats.withColumn("_fold", pmod(xxhash64(col(feats.columns.head)), lit(5)))
    val train = keyed.filter(col("_fold") =!= 0)
    val test = keyed.filter(col("_fold") === 0)
    val asm = new VectorAssembler().setInputCols(cols).setOutputCol("features")
    val lr = new LinearRegression().setFeaturesCol("features").setLabelCol("label")
      .setRegParam(0.1)
    val model = lr.fit(asm.transform(train))
    val pred = model.transform(asm.transform(test))
    val mae = new RegressionEvaluator().setMetricName("mae").evaluate(pred)
    val rmse = new RegressionEvaluator().setMetricName("rmse").evaluate(pred)
    val metrics = Seq(
      ("mae", mae), ("rmse", rmse),
      ("train_rows", train.count().toDouble),
      ("test_rows", test.count().toDouble)).toDF("metric", "value")
    (metrics, pred.select((cols.map(c => col(c)) :+ col("label") :+ col("prediction")): _*))
  }
}
