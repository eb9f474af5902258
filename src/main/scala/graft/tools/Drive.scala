package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Scratch verification driver: saltedJoin on real testdata — result parity
  * with the plain join, and the (key, salt) join key visible in the plan. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    val orders = spark.read.parquet(s"$sf/orders.parquet").select("o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sf/customer.parquet").select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")

    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = graft.dp.SkewJoin.saltedJoin(orders, customer, "o_custkey", salts = 8)
    val pc = plain.count()
    val sc = salted.count()
    println(s"[drive] plain=$pc salted=$sc match=${pc == sc}")
    val pSum = plain.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0)
    val sSum = salted.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().get(0)
    println(s"[drive] sum parity: $pSum vs $sSum match=${pSum == sSum}")
    println("[drive] salted plan:")
    salted.explain()
    spark.stop()
  }
}
