package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1) groupedBinning on real data + an injected null-key row
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("value"))
      .withColumnRenamed("value", "amount")
    val withNullKey = ev.unionByName(
      Seq((null.asInstanceOf[String], 42.0)).toDF("event_type", "amount"))
    val binned = graft.features.Binning.groupedBinning(withNullKey, "event_type", "amount", 4)
    binned.groupBy("event_type", "bucket").count()
      .orderBy(col("event_type").asc_nulls_first, col("bucket")).show(30, false)

    // 2) one-hot with colliding + literal-suffix category names
    val oh = graft.features.Encoding.OneHotModel("c", Seq("a_b", "a_b_1", "a.b", "a_b_2"))
      .transform(Seq("a_b", "a_b_1", "a.b", "a_b_2").toDF("c"))
    oh.show(false)

    // 3) cosineTopK with int query ids vs long corpus ids (widening allowed)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val intQ = emb.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id").cast("int"))
    val top = graft.similarity.Similarity
      .cosineTopK(emb, intQ, "vec_id", "embedding", "vec_id", 5)
    top.show(20, false)
    println(s"widened-id topk rows = ${top.count()}")

    spark.stop()
  }
}
