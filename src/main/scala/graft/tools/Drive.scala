package graft.tools

import graft.Sessions

/** Scratch verification driver: simulate the bench sequence (alphabetical,
  * cold+warm per query, clearState between) up to dedup_exact, with an
  * optional skip list, to bisect which predecessor stalls it. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = "/root/testdata/sf0.01"
    val skip = args.headOption.map(_.split(",").toSet).getOrElse(Set.empty)

    spark.read.parquet(s"$sf/region.parquet").groupBy("r_name").count().count()

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[drive] $label: $s%.2f s ($n rows)")
      s
    }

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val prefix = all.takeWhile(_._1 != "dedup_exact").filterNot(p => skip(p._1))
    val target = all.find(_._1 == "dedup_exact").get

    prefix.foreach { case (name, fn) =>
      clearState()
      time(s"$name cold")(fn(spark, sf).count())
      clearState()
      time(s"$name warm")(fn(spark, sf).count())
    }
    clearState()
    time("dedup_exact cold")(target._2(spark, sf).count())
    clearState()
    time("dedup_exact warm")(target._2(spark, sf).count())
    spark.stop()
  }
}
