package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Categorical encoders (reference: src/ta_lib/pyspark/features.py:28-286
  * `Encoder`): one-hot, ordinal (user map), target (group mean/median).
  *
  * Scale design: target encoding keeps the category→statistic map as a small
  * DataFrame and BROADCAST-joins it back (the reference collectAsMap()s to the
  * driver, features.py:238-247, which dies at high cardinality). One-hot uses
  * spark.ml StringIndexer+OneHotEncoder; ordinal uses a literal create_map
  * (fine — user maps are small by construction).
  */
object Encoding {

  /** Ordinal encode via an explicit category→rank map
    * (reference: features.py:204-212). */
  def ordinalEncode(df: DataFrame, c: String, mapping: Map[String, Int], default: Int = -1): DataFrame = {
    val kv: Seq[Column] = mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val m = map(kv: _*)
    df.withColumn(s"${c}_ord", coalesce(m(col(c)), lit(default)))
  }

  /** Target-encoding model: category → mean(target) learned on train.
    * Unseen categories at transform time get the global prior. The join
    * is NULL-SAFE (<=>) like [[FrequencyModel]]: fit learns a mean for
    * the null group, and a null-unsafe equi-join could never deliver it
    * — null rows would silently get the prior instead. */
  final case class TargetModel(mapping: DataFrame, c: String, prior: Double) {
    def transform(df: DataFrame): DataFrame =
      df.join(
          broadcast(mapping.withColumnRenamed(c, "__cat")),
          df(c) <=> col("__cat"),
          "left")
        .drop("__cat")
        .withColumn(s"${c}_te", coalesce(col(s"${c}_te"), lit(prior)))
  }

  /** Learn a target encoding (reference: features.py:215-258 "target"
    * mode; mean statistic). The mapping stays a DataFrame end to end. */
  def fitTargetEncoder(df: DataFrame, c: String, target: String): TargetModel = {
    val mapping = df
      .groupBy(col(c))
      .agg(avg(col(target)).as(s"${c}_te"))
    val prior = df.agg(avg(col(target))).collect()(0).getDouble(0)
    TargetModel(mapping, c, prior)
  }

  /** Frequency-encoding model: category → occurrence share learned on
    * train; unseen categories at transform time get 0.0. The join is
    * NULL-SAFE (<=>): a null category learned on train reaches its share
    * at transform time instead of silently encoding as unseen. */
  final case class FrequencyModel(mapping: DataFrame, c: String) {
    def transform(df: DataFrame): DataFrame =
      df.join(
          broadcast(mapping.withColumnRenamed(c, "__cat")),
          df(c) <=> col("__cat"),
          "left")
        .drop("__cat")
        .withColumn(s"${c}_freq", coalesce(col(s"${c}_freq"), lit(0.0)))
  }

  /** Learn a frequency encoding — the standard high-cardinality fallback
    * this module's one-hot/label caps point to. The mapping stays a
    * DataFrame (one groupBy, no driver-side category collection), so any
    * cardinality fits; the total is a driver scalar from a count. */
  def fitFrequencyEncoder(df: DataFrame, c: String): FrequencyModel = {
    val total = df.count().toDouble
    val mapping = df
      .groupBy(col(c))
      .agg((count(lit(1)) / total).as(s"${c}_freq"))
    FrequencyModel(mapping, c)
  }

  /** One-hot as explicit indicator columns for each seen category — a pure
    * projection (when/otherwise per category), codegen-friendly and
    * oracle-checkable; spark.ml's OneHotEncoder (vector output) is used in
    * the ML pipeline path instead (see model.Registry). */
  final case class OneHotModel(c: String, categories: Seq[String]) {
    def transform(df: DataFrame): DataFrame = {
      // sanitization can collide two distinct categories ("a.b" and
      // "a_b" both become "a_b") — the second withColumn would silently
      // OVERWRITE the first indicator; take names first-come-first-served
      // and suffix later claimants until the full set is collision-free
      // (a literal category "a_b_0" can collide with a suffixed one, so a
      // single suffixing pass is not enough)
      val seen = scala.collection.mutable.HashSet.empty[String]
      val deduped = categories.map(_.replaceAll("[^A-Za-z0-9]", "_")).zipWithIndex.map {
        case (nm, i) =>
          val unique =
            if (seen.add(nm)) nm
            else Iterator.from(i).map(j => s"${nm}_$j").find(seen.add).get
          unique
      }
      categories.zip(deduped).foldLeft(df) { case (d, (cat, nm)) =>
        d.withColumn(s"${c}_$nm", when(col(c) === lit(cat), 1).otherwise(0))
      }
    }
  }

  /** Collects the distinct categories (they become column names, so a
    * driver collect is inherent to one-hot) but CAPS the collect at
    * maxCategories + 1 rows and fails loudly — a high-cardinality column
    * can't OOM the driver. Route such columns to target/frequency encoding
    * instead. */
  def fitOneHot(df: DataFrame, c: String, maxCategories: Int = 1000): OneHotModel = {
    val cats = df
      .select(col(c))
      .filter(col(c).isNotNull)
      .distinct()
      .orderBy(col(c))
      .limit(maxCategories + 1)
      .collect()
      .map(_.getString(0))
      .toSeq
    require(
      cats.size <= maxCategories,
      s"fitOneHot($c): more than $maxCategories distinct categories — " +
        "use target/frequency encoding for high-cardinality columns")
    OneHotModel(c, cats)
  }

  /** Label (index) encoding by frequency-descending rank
    * (reference: eda.py:805-827 uses StringIndexer; same ordering rule:
    * most frequent = 0, ties by value).
    *
    * Like [[fitOneHot]], the category count is CAPPED: the global
    * `row_number` window funnels the whole frequency frame through one
    * task, which is fine for true categoricals but would melt on a
    * high-cardinality column — the distributed TakeOrderedAndProject
    * `limit` bounds what reaches the window, and the fit fails loudly past
    * the cap. */
  def fitLabelEncoding(df: DataFrame, c: String, maxCategories: Int = 10000): DataFrame = {
    // ONE job: the distributed TakeOrdered collects the (<= cap+1)-row
    // frequency head; ranking the capped head is then driver-side (like
    // fitOneHot) instead of re-running the groupBy for a window pass.
    // The category column keeps its INPUT type — a string cast would
    // silently reorder numeric ties ("10" < "2") and break join types.
    val top = df
      .groupBy(col(c))
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc(c))
      .limit(maxCategories + 1)
      .collect()
    require(
      top.length <= maxCategories,
      s"fitLabelEncoding($c): more than $maxCategories distinct categories — " +
        "use target/frequency encoding for high-cardinality columns")
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(c).copy(name = c),
      org.apache.spark.sql.types.StructField(s"${c}_idx", org.apache.spark.sql.types.IntegerType, nullable = false)))
    val rows = top.toSeq.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), schema)
  }

  /** Null-safe like [[FrequencyModel]]: a null category learned at fit
    * reaches its index at transform time. */
  def applyLabelEncoding(df: DataFrame, mapping: DataFrame, c: String): DataFrame =
    df.join(
        broadcast(mapping.withColumnRenamed(c, "__cat")),
        df(c) <=> col("__cat"),
        "left")
      .drop("__cat")
}
