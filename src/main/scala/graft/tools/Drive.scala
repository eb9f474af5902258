package graft.tools

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "16")
    spark.sparkContext.setLogLevel("ERROR")

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (noise <- Seq(1.0)) {
      val big = Recall.clusteredCorpus(spark, 120000L, 32, 256, noise)
      val q = big.filter(col("vec_id") < 50)
      val brute = pairSet(Similarity.cosineTopK(big, q, "vec_id", "vec", "vec_id", 10))
      val ivf = pairSet(Similarity.ivfCosineTopK(big, q, "vec_id", "vec", "vec_id", 10))
      val r1 = (brute & ivf).size.toDouble / brute.size
      val rh = Recall.clusteredCorpus(spark, 24000L, 32, 256, noise)
        .select(col("vec_id"), col("vec"), col("vec_id").as("doc"))
      val rhQ = rh.filter(col("vec_id") < 50)
      val ex = pairSet(Similarity.cosineTopK(rh, rhQ, "vec_id", "vec", "vec_id", 10))
      val ap = pairSet(Similarity.retrievalNeighbors(rh, "vec_id", "vec", "doc",
        k = 10, nlist = 256, nprobe = 8).filter(col("query_id") < 50))
      val r2 = (ex & ap).size.toDouble / ex.size
      println(f"NOISE $noise%.1f scale_policy=$r1%.4f hierarchical=$r2%.4f")
    }
    spark.stop()
  }
}
