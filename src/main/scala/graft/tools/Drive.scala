package graft.tools

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "16")
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q5 = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.cosineTopK(emb, q5, "vec_id", "embedding", "vec_id", 10))
    for (np <- Seq(4, 8, 16)) {
      val ivf = pairs(Similarity.ivfCosineTopK(
        emb, q5, "vec_id", "embedding", "vec_id", k = 10, nlist = 16, nprobe = np))
      println(s"nprobe=$np recall=${(brute & ivf).size.toDouble / brute.size} found=${(brute & ivf).size}/${brute.size}")
    }
    spark.stop()
  }
}
