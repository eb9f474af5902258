package graft.tools

import graft.similarity.Similarity
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
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", "vec_id", 10))
    for ((tables, bits, probes) <- Seq((8, 8, 8), (16, 8, 8), (8, 6, 6), (16, 6, 6), (8, 4, 4), (16, 8, 4))) {
      val lsh = pairs(Similarity.lshCosineTopK(emb, q, "vec_id", "embedding", "vec_id",
        k = 10, tables = tables, bits = bits, probes = probes))
      println(f"tables=$tables%2d bits=$bits probes=$probes: recall=${(brute & lsh).size.toDouble / brute.size}%.2f")
    }
    spark.stop()
  }
}
