package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. union-find fast path vs distributed loop on real fuzzy pairs
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .filter(col("c_custkey") <= 300).select(col("c_custkey"), col("c_name"))
    val pairs = graft.dedup.Fuzzy.fuzzyPairsD1(cust, "c_custkey", "c_name")
    val t0 = System.nanoTime()
    val fast = graft.dedup.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val t1 = System.nanoTime()
    val dist = graft.dedup.Dedup.nearDupClusters(pairs, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    val t2 = System.nanoTime()
    println(f"fast-path ${(t1 - t0) / 1e9}%.2fs vs distributed ${(t2 - t1) / 1e9}%.2fs, " +
      s"labels equal: ${fast == dist}, clusters: ${fast.values.toSet.size}")
    require(fast == dist, "fast path diverged from distributed loop")

    // 2. the four new catalog jobs end to end via the job registry
    val work = java.nio.file.Files.createTempDirectory("graft_drive_jobs").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100).write.mode("overwrite").parquet(s"$work/docs")
    graft.queries.Support.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("tsec"))
      .write.mode("overwrite").parquet(s"$work/metrics")
    Seq((1L, 0L, "a"), (2L, 0L, "b")).toDF("k", "ts", "v")
      .write.mode("overwrite").parquet(s"$work/vlog")
    val cfg = Map(
      "core" -> Map("seed" -> 7, "audit_plans" -> true),
      "job_catalog" -> Map("jobs" -> List(
        Map("name" -> "tokenizer", "stages" -> List(
          Map("name" -> "fit", "tasks" -> List(
            Map("name" -> "train",
              "params" -> Map("algo" -> "unigram", "vocab_size" -> "256", "max_words" -> "1000")),
            Map("name" -> "encode", "params" -> Map("algo" -> "unigram", "ids" -> "true")))))),
        Map("name" -> "metric-profile", "stages" -> List(
          Map("name" -> "p", "tasks" -> List(
            Map("name" -> "cms-fold", "params" -> Map("item_col" -> "user_id", "batch_id" -> "1")))))),
        Map("name" -> "history", "stages" -> List(
          Map("name" -> "f", "tasks" -> List(
            Map("name" -> "scd2-fold", "params" -> Map("key_col" -> "k", "ts_col" -> "ts", "batch_id" -> "1")))))),
        Map("name" -> "layout", "stages" -> List(
          Map("name" -> "o", "tasks" -> List(
            Map("name" -> "zorder", "params" -> Map("cols" -> "user_id,value", "n_files" -> "4")))))))),
      "data_catalog" -> Map(
        "raw" -> Map("documents" -> s"$work/docs", "metrics_batch" -> s"$work/metrics",
          "version_log" -> s"$work/vlog", "layout_input" -> s"$work/metrics"),
        "models" -> Map("unigram_pieces" -> s"$work/pieces",
          "cms_state" -> s"$work/cms_state", "scd2_dim" -> s"$work/scd2_dim"),
        "processed" -> Map("tokenized" -> s"$work/tokenized",
          "cms_profile" -> s"$work/cms_profile", "layout_zordered" -> s"$work/zordered")))
    graft.pipeline.Production.registerAll()
    val ctx = graft.config.Context(cfg, spark)
    Seq("tokenizer", "metric-profile", "history", "layout").foreach { j =>
      val fails = graft.pipeline.Jobs.run(ctx, j)
      require(fails.isEmpty, s"job $j failed: $fails")
    }
    println("tokenized:"); spark.read.parquet(s"$work/tokenized").show(3)
    println("cms_profile:"); spark.read.parquet(s"$work/cms_profile").show(3)
    println("scd2_dim:"); spark.read.parquet(s"$work/scd2_dim").show()
    println(s"zordered rows = ${spark.read.parquet(s"$work/zordered").count()}")
    println("ALL CATALOG JOBS OK")
  }
}
