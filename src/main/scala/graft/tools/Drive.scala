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
    import graft.similarity.Similarity

    // IVF recall vs nprobe sweep at two corpus sizes — the measurement
    // behind the auto-nprobe rule (target: recall >= 0.85)
    for (sf <- Seq("0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val n = emb.count()
      val queries = emb.filter(col("vec_id") < 5)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(
        Similarity.cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 10))
      val cells = Similarity.ivfAutoNlist(n)
      val autoProbe = Similarity.ivfAutoNprobe(cells, n, 10)
      println(s"sf$sf: N=$n cells=$cells autoNprobe=$autoProbe")
      for (np <- Seq(autoProbe, cells / 3, cells * 2 / 5, cells / 2, cells * 3 / 5, cells * 3 / 4).distinct.sorted if np >= 1) {
        val ivf = pairs(
          Similarity.ivfCosineTopK(emb, queries, "vec_id", "embedding", "vec_id",
            k = 10, nlist = cells, nprobe = np))
        val rec = (brute & ivf).size.toDouble / brute.size
        println(f"  nprobe=$np%3d (${np * 100.0 / cells}%5.1f%% probed): recall=$rec%.3f")
      }
    }

    spark.stop()
  }
}
