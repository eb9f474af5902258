package graft.tools

import graft.Sessions
import graft.features._
import graft.eval.Metrics
import graft.profile.Profile
import org.apache.spark.sql.functions._

/** Scratch verification driver: exercises the round-2 weak-plan fixes
  * against /root/testdata/sf0.001 through the public operator surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = "/root/testdata/sf0.001"

    if (args.headOption.contains("model")) { driveModel(spark, sf); spark.stop(); return }
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")

    println("=== 1. ivTable (no global-sort window) ===")
    val withY = lineitem.withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val ivt = InformationValue.ivTable(withY, Seq("l_quantity", "l_extendedprice", "l_discount"), "y")
    ivt.show(false)
    println("--- plan (expect Window only with partitionBy feature, post-agg) ---")
    ivt.explain()

    println("=== 2. thresholdMetrics single pass ===")
    val scored = lineitem.select((col("l_discount") * 10).as("score"),
      when(col("l_quantity") > 25, 1.0).otherwise(0.0).as("label"))
    val tm = Metrics.thresholdMetrics(scored, "score", "label", Seq(0.1, 0.3, 0.5, 0.7, 0.9))
    tm.show(false)
    println("--- plan (expect ONE Aggregate over the scan) ---")
    tm.explain()

    println("=== 3. healthAnalysis fused single pass ===")
    val ha = Profile.healthAnalysis(customer)
    ha.show(false)
    ha.explain()

    println("=== 4. setAnalyse one full-outer join ===")
    val sa = Profile.setAnalyse(customer.select(col("c_custkey")), orders.select(col("o_custkey").as("c_custkey")), "c_custkey")
    sa.show(false)
    sa.explain()

    println("=== 5. fitOneHot cap ===")
    try {
      Encoding.fitOneHot(customer, "c_mktsegment", maxCategories = 3)
      println("ERROR: expected require failure")
    } catch {
      case e: IllegalArgumentException => println(s"capped OK: ${e.getMessage}")
    }
    val oh = Encoding.fitOneHot(customer, "c_mktsegment")
    println(s"uncapped categories: ${oh.categories}")

    println("=== 6. exact vs approx percentile flag ===")
    val mExact = OutlierTreatment.fit(lineitem, Seq("l_quantity"), exact = true)
    val mApprox = OutlierTreatment.fit(lineitem, Seq("l_quantity"))
    println(s"exact bounds:  ${mExact.bounds}")
    println(s"approx bounds: ${mApprox.bounds}")

    println("=== 7. null guards ===")
    val constDf = lineitem.withColumn("const_col", lit(1.0))
    val dropped = FeatureElimination.byCorrelation(constDf, Seq("l_quantity", "const_col"), 0.5)
    println(s"byCorrelation with constant col (no NPE): dropped=$dropped")
    val one = lineitem.limit(1)
    val sm = Scaling.fitStandard(one, Seq("l_quantity"))
    println(s"fitStandard on 1 row (stddev null -> 0): ${sm.stats}")
    sm.transform(one).select(col("l_quantity"), col("l_quantity_scaled")).show()

    spark.stop()
  }

  /** E2E: E1 pipeline output -> features vector -> LR train -> save/load ->
    * score -> AUC + importance, through the public library surface. */
  def driveModel(spark: org.apache.spark.sql.SparkSession, sf: String): Unit = {
    import graft.model.{Features, Training}
    val e1 = graft.queries.PipelineQueries.e1(spark, sf).na.fill(0)
    println(s"E1 rows: ${e1.count()}")
    val featureCols = Seq("c_acctbal", "last_click_date_diff", "total_click_value",
      "last_view_date_diff", "total_view_value", "last_purchase_date_diff", "total_purchase_value")
    val model = Training.train(e1, "target_var", featureCols)
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    Training.saveModel(model, s"$dir/m")
    val loaded = Training.loadModel(s"$dir/m")
    val scored = Training.score(loaded, e1)
    scored.select("c_custkey", "target_var", "score").show(5, false)
    val (auroc, aupr) = graft.eval.Metrics.aucMetrics(scored, "score", "target_var")
    println(s"auROC=$auroc auPR=$aupr (features are unrelated to the 1997 label window; ~0.5 expected)")
    Training.featureImportance(e1, "target_var", featureCols).show(false)
    println("grid search:")
    val cv = Training.gridSearchLogistic(e1, "target_var", featureCols,
      regParams = Seq(0.0, 0.1), elasticNetParams = Seq(0.0), numFolds = 2)
    println(s"best avg metric: ${cv.avgMetrics.max}")
  }
}
