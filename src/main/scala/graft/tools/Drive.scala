package graft.tools
import graft.Sessions

/** Scratch verification driver — edit freely (see .claude/skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchQueries
    val name = "ann_ivfpq_refined"
    all(name)(spark, dir).count() // warm + ensure index
    val df = all(name)(spark, dir)
    df.queryExecution.toRdd.count() // execute THIS plan so node metrics populate
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("time") || k.contains("duration") || k == "numOutputRows") && m.value > 0 }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          println(("  " * (depth+1)) + "[reused]")
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
