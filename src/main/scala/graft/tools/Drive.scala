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
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 5)
      val exact = graft.similarity.Similarity
        .cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 10)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.similarity.Similarity
        .ivfCosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 10)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$sf auto recall=${(exact & got).size.toDouble / exact.size}%.2f")
    }
    spark.stop()
  }
}
