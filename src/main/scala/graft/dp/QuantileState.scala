package graft.dp

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Per-key mergeable QUANTILE state — the percentile companion to
  * [[IncrementalAgg.distinctSketch]].
  *
  * At 100 TB you do not re-sort history to track p50/p99 of a monitored
  * metric per key: you keep a few-KB Greenwald–Khanna summary per key
  * (Spark's own `QuantileSummaries`, the sketch behind `approxQuantile`)
  * and fold each batch's partial state in. The GK contract: a query at
  * probability p returns a value whose RANK is within ±ε·n of ⌈p·n⌉ —
  * rank error, not value error, which is the bound the
  * `quantile_sketch_state` oracle asserts (a value-closeness bound would
  * be meaningless for skewed metrics).
  *
  * State encoding is a versioned manual binary layout (NOT Java
  * serialization): `[u8 version][f64 relErr][i32 compressThreshold]
  * [i64 count][i32 nStats][nStats × (f64 value, i64 g, i64 delta)]` —
  * stable across Spark upgrades, so persisted state directories survive a
  * cluster migration. The aggregation buffer inside one job uses the
  * kryo-free path too (same codec) for determinism.
  *
  * Scale shape: `quantileSketch` is a map-side-combinable groupBy (each
  * task folds its partition into per-key summaries; only summaries — KBs
  * per key — cross the shuffle). `mergeQuantileSketches` is a union +
  * re-aggregate over state frames: cost proportional to the number of
  * keys, never the history.
  */
object QuantileState {

  /** Default GK relative rank error — matches Spark's approxQuantile
    * default. ~1.6 KB of stats per key at 1M rows. */
  val DefaultRelativeError: Double = 0.01

  private val Version: Byte = 1

  private[graft] def serialize(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Version.toInt)
    out.writeDouble(c.relativeError)
    out.writeInt(c.compressThreshold)
    out.writeLong(c.count)
    val stats = c.sampled
    out.writeInt(stats.length)
    stats.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  private[graft] def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == Version, s"unknown quantile-state version $v (expected $Version)")
    val relErr = in.readDouble()
    val threshold = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val stats = Array.fill(n) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    new QuantileSummaries(threshold, relErr, stats, count, true)
  }

  /** Typed aggregator: doubles in, serialized compressed summary out.
    * Used through `functions.udaf` so it participates in partial
    * aggregation (map-side combine) like any built-in. Nulls are the
    * caller's to drop — a GK summary has no null slot. */
  private final class SketchAgg(relErr: Double)
      extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
      b.insert(v)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    override def finish(b: QuantileSummaries): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.javaSerialization[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Fold serialized states into one (used by the merge frame op).
    * States built at different relative errors refuse to merge — the
    * combined summary's rank bound would silently decay to the worse ε,
    * and every estimate read downstream would over-trust it. */
  private def checkedMerge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    require(a.relativeError == b.relativeError,
      s"quantile-state merge: mismatched relative errors " +
        s"(${a.relativeError} vs ${b.relativeError}) — rebuild one side")
    a.merge(b)
  }

  private final class MergeAgg
      extends Aggregator[Array[Byte], Option[QuantileSummaries], Array[Byte]] {
    override def zero: Option[QuantileSummaries] = None
    override def reduce(b: Option[QuantileSummaries], v: Array[Byte]): Option[QuantileSummaries] = {
      val qs = deserialize(v)
      Some(b.fold(qs)(checkedMerge(_, qs)))
    }
    override def merge(a: Option[QuantileSummaries], b: Option[QuantileSummaries]): Option[QuantileSummaries] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(checkedMerge(x, y))
        case (x, None)          => x
        case (None, y)          => y
      }
    override def finish(b: Option[QuantileSummaries]): Array[Byte] =
      b.map(serialize).orNull
    override def bufferEncoder: Encoder[Option[QuantileSummaries]] =
      Encoders.javaSerialization[Option[QuantileSummaries]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One batch's per-key quantile state: `keyCol, qstate binary`. Null
    * values are dropped (they have no rank). */
  def quantileSketch(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      relErr: Double = DefaultRelativeError): DataFrame = {
    require(relErr > 0 && relErr < 1, s"need 0 < relErr < 1, got $relErr")
    val agg = udaf(new SketchAgg(relErr))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(agg(col(valueCol).cast("double")).as("qstate"))
  }

  /** Fold two quantile state frames: union + per-key GK merge. Merge is
    * associative and the merged summary keeps the ε rank bound over the
    * combined count — the invariant the spec asserts. */
  def mergeQuantileSketches(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val fold = udaf(new MergeAgg)
    a.unionByName(b)
      .groupBy(col(keyCol))
      .agg(fold(col("qstate")).as("qstate"))
  }

  /** Read a state frame: one `q_<pct>` column per requested probability
    * (e.g. 0.5 -> q_50, 0.99 -> q_99), plus `n_state` (the summary's
    * exact row count — GK counts exactly even though ranks are approx). */
  def estimateQuantiles(
      state: DataFrame,
      keyCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0, 1], got $probs")
    // one deserialization per row: count and quantiles come out together
    val readUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) (0L, Array.fill(probs.length)(Double.NaN))
      else {
        val qs = deserialize(bytes)
        (qs.count, probs.map(p => qs.query(p).getOrElse(Double.NaN)).toArray)
      }
    }
    val withArr = state
      .withColumn("__r", readUdf(col("qstate")))
      .select(
        col(keyCol),
        col("__r._1").as("n_state"),
        col("__r._2").as("__q"))
    probs.zipWithIndex.foldLeft(withArr) { case (df, (p, i)) =>
      df.withColumn(nameFor(p), col("__q").getItem(i))
    }.drop("__q")
  }

  private def nameFor(p: Double): String = {
    val pct = p * 100
    val s = if (pct == math.rint(pct)) f"${pct.toLong}" else f"$pct%.1f".replace(".", "_")
    s"q_$s"
  }

  /** Rank-bound audit of an estimate frame against the raw rows it
    * summarizes: for each key and probability, TRUE iff SOME rank of the
    * estimate among the key's values is within ±max(1, ⌈ε·n⌉) of the
    * target rank ⌈p·n⌉ — the GK guarantee. A tied value occupies the
    * whole rank interval [count(<q)+1, count(<=q)], and the guarantee
    * holds for some rank IN that interval — checking only count(<=q)
    * (the max rank of the tie group) failed sketches whose key piles
    * more than 2ε of its mass on one value. The check passes iff the
    * interval intersects [target−bound, target+bound]. Joins estimates
    * back to the data on the key (the planner broadcasts when the
    * estimate frame is small; at extreme key cardinality it stays a
    * shuffle join — never forced), so it costs one scan of the audited
    * batch. */
  def rankWithinBound(
      df: DataFrame,
      estimates: DataFrame,
      keyCol: String,
      valueCol: String,
      probs: Seq[Double],
      relErr: Double = DefaultRelativeError): DataFrame = {
    val joined = df.filter(col(valueCol).isNotNull).join(estimates, Seq(keyCol))
    val aggs = probs.flatMap { p =>
      val qc = nameFor(p)
      Seq(
        count(when(col(valueCol).cast("double") < col(qc), 1)).as(s"__rlo_$qc"),
        count(when(col(valueCol).cast("double") <= col(qc), 1)).as(s"__rhi_$qc"))
    }
    val n = count(lit(1)).as("__n")
    val ranked = joined.groupBy(col(keyCol), col("n_state"))
      .agg(aggs.head, (aggs.tail :+ n): _*)
    val checks = probs.map { p =>
      val qc = nameFor(p)
      val target = ceil(lit(p) * col("__n"))
      val bound = greatest(lit(1.0), ceil(lit(relErr) * col("__n")))
      ((col(s"__rlo_$qc") + 1 <= target + bound) &&
        (col(s"__rhi_$qc") >= target - bound)).as(s"within_$qc")
    }
    ranked.select(
      (col(keyCol) +: (col("__n").cast("long").as("n") +:
        (col("n_state") === col("__n")).as("count_exact") +: checks)): _*)
  }
}
