package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet").groupBy().count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val counts = graft.sampling.Dsir.hashedNgramCounts(docs, "doc_id", "text", 512)
    time("tokenize-only") {
      docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("g"))
        .groupBy().count().count()
    }
    time("grams-only") {
      docs.withColumn("__tk", split(trim(lower(col("text"))), "\\s+"))
        .withColumn("__grams", concat(col("__tk"),
          when(size(col("__tk")) >= 2,
            expr("transform(sequence(0, size(__tk) - 2), i -> concat(__tk[i], ' ', __tk[i + 1]))"))
            .otherwise(expr("array()").cast("array<string>"))))
        .select(explode(col("__grams")).as("g")).groupBy().count().count()
    }
    time("counts") { counts.groupBy().count().count() }
    time("counts-again") { counts.count() }
    time("logWeights") {
      graft.sampling.Dsir.logWeights(docs, docs.filter(col("doc_id") < 100),
        "doc_id", "text", buckets = 512).count()
    }
  }
}
