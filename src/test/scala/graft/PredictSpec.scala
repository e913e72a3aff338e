package graft

import graft.ml.Predict

/** Shape + MAE sanity for the MLE-goal regressions (SURVEY §2.12) — not
  * oracle-compared (model fit is MLlib's, not the engine's). */
class PredictSpec extends SparkSpec {

  test("load forecast trains and beats the trivial zero predictor") {
    val (metrics, preds) = Predict.loadForecast(spark, sf001)
    val m = metrics.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("train_rows") > 0 && m("test_rows") > 0)
    assert(preds.count() > 0)
    val meanLabel = preds.agg(org.apache.spark.sql.functions.avg("label"))
      .head().getDouble(0)
    assert(m("mae") < math.max(meanLabel, 0.5) * 2,
      s"mae=${m("mae")} vs mean label $meanLabel")
  }

  test("session length + unique urls models produce finite predictions") {
    for (fit <- Seq(Predict.sessionLength _, Predict.uniqueUrls _)) {
      val (metrics, preds) = fit(spark, sf001)
      val m = metrics.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(m("mae").isFinite && m("rmse").isFinite)
      assert(preds.collect().forall(r =>
        !r.getDouble(r.fieldIndex("prediction")).isNaN))
    }
  }

  test("purchase-propensity classifier fits with a valid AUC on sf0.01") {
    // sf0.01 for a balanced 77/150 label split (sf0.001 has 15 users,
    // all positive). Mechanics, not lift: the generator carries no signal.
    val (metrics, preds) = Predict.purchasePropensity(spark, "/root/testdata/sf0.01")
    val m = metrics.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("auc") >= 0.0 && m("auc") <= 1.0, s"auc=${m("auc")}")
    assert(m("n_train") > 0 && m("n_test") > 0)
    val ps = preds.collect()
    assert(ps.forall { r =>
      val p = r.getDouble(r.fieldIndex("prediction")); p == 0.0 || p == 1.0
    })
    // deterministic hash split → stable test-set size
    assert(ps.length === m("n_test").toInt)
  }
}
