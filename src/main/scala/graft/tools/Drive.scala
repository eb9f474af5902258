package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // IVF-PQ refine: ADC shortlist + int8 re-rank — recall vs raw ADC,
    // bytes vs full-precision IVF, and the refined-search plan
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqr").toString
    graft.similarity.AnnIndex.buildIvfPq(emb, "vec_id", "embedding", s"$dir/pq",
      m = 8, codes = 256)
    graft.similarity.AnnIndex.buildIvfPq(emb, "vec_id", "embedding", s"$dir/pqr",
      m = 8, codes = 256, refine = true)
    graft.similarity.AnnIndex.buildIvf(emb, "vec_id", "embedding", s"$dir/ivf")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = graft.similarity.Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pqSet = graft.similarity.AnnIndex
      .searchIvfPq(spark, s"$dir/pq", queries, "vec_id", "embedding", k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val refined = graft.similarity.AnnIndex
      .searchIvfPq(spark, s"$dir/pqr", queries, "vec_id", "embedding", k = 10,
        refine = 10)
    val refSet = refined
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    println(f"ADC recall@10     = ${(brute & pqSet).size.toDouble / brute.size}%.3f")
    println(f"refined recall@10 = ${(brute & refSet).size.toDouble / brute.size}%.3f")
    refined.orderBy($"query_id", $"rank").show(12)
    def bytesOf(p: String): Long = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    println(s"codes-only bytes ratio  = ${bytesOf(s"$dir/pq/corpus.parquet").toDouble / bytesOf(s"$dir/ivf/corpus.parquet")}")
    println(s"refine-index bytes ratio = ${bytesOf(s"$dir/pqr/corpus.parquet").toDouble / bytesOf(s"$dir/ivf/corpus.parquet")}")
    refined.explain("formatted")
  }
}
