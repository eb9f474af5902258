package graft.tools

import graft.config.Context
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // balanced features table in the production schema
    val work = java.nio.file.Files.createTempDirectory("drive-grid").toString
    val rnd = new scala.util.Random(11)
    (1 to 100).map { i =>
      val y = i % 2
      (i.toLong, 100.0 + y * 50 + rnd.nextGaussian(),
        10 + y * 5, 5.0 * y + rnd.nextDouble(),
        20 - y * 5, 3.0 * (1 - y) + rnd.nextDouble(),
        15 + y * 2, 7.0 * y + rnd.nextDouble(), y)
    }.toDF("c_custkey", "c_acctbal", "last_click_date_diff", "total_click_value",
        "last_view_date_diff", "total_view_value", "last_purchase_date_diff",
        "total_purchase_value", "target_var")
      .write.mode("overwrite").parquet(s"$work/features")

    // a real on-disk config tree, same shape as conf/ — exercises
    // fromConfigFile's catalog loading + interpolation, then the job
    val confDir = java.nio.file.Files.createTempDirectory("drive-conf")
    java.nio.file.Files.writeString(confDir.resolve("config.yml"),
      s"""catalogs:
         |  data_catalog: data_catalog.yml
         |  job_catalog: job_catalog.yml
         |core:
         |  app_name: drive-grid
         |""".stripMargin)
    java.nio.file.Files.writeString(confDir.resolve("data_catalog.yml"),
      s"""processed:
         |  features: $work/features
         |models:
         |  classifier: $work/model
         |""".stripMargin)
    java.nio.file.Files.writeString(confDir.resolve("job_catalog.yml"),
      """jobs:
        |  - name: model-gen
        |    stages:
        |      - name: training
        |        tasks:
        |          - name: train
        |            params:
        |              model: logistic_regression
        |              param_grid:
        |                regParam: [0.0, 0.5]
        |                elasticNetParam: ["1.0"]
        |              num_folds: "2"
        |""".stripMargin)

    graft.pipeline.Production.registerAll()
    val ctx = Context.fromConfigFile(confDir.resolve("config.yml").toString)
    val failures = graft.pipeline.Jobs.run(ctx, "model-gen")
    println(s"failures=$failures")

    val model = graft.model.Training.loadModel(s"$work/model")
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    println(s"winner regParam=${lr.getRegParam} elasticNet=${lr.getElasticNetParam} " +
      s"fromGrid=${Set(0.0, 0.5).contains(lr.getRegParam) && lr.getElasticNetParam == 1.0}")
    spark.stop()
  }
}
