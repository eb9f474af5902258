package graft.io

import org.apache.spark.sql.SparkSession

/** Driver-side read of a 1-row parquet table (r20 optimization round).
  *
  * The persisted-index metas are single tiny files, but reading them with
  * `spark.read.parquet(...).head()` pays file listing + query planning +
  * a scheduled 1-task Spark job PER CALL — and the sharded searches
  * resolve 2-3 metas per shard, so meta reads dominated the driver time
  * of a 3-shard search (r20 job profile). This reads the same bytes with
  * plain parquet-hadoop on the driver: same fields, no job, no plan.
  * Strictly a READ-PATH change — writers still go through Spark, and
  * every call re-reads the file (no caching), so external meta updates
  * are picked up exactly as before.
  */
object DriverParquet {

  /** The first row found under `dir` (part files scanned in listing
    * order — a writer may emit empty parts, so keep scanning until a row
    * appears), as a parquet-example Group. `f` extracts the typed
    * fields; readers are closed either way. */
  def readSingleRow[T](spark: SparkSession, dir: String)(
      f: org.apache.parquet.example.data.Group => T): T = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_") &&
        !p.getName.startsWith("."))
      .sortBy(_.getName)
    require(parts.nonEmpty, s"$dir has no parquet part file")
    for (part <- parts) {
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), part)
        .withConf(spark.sparkContext.hadoopConfiguration)
        .build()
      try {
        val g = reader.read()
        if (g != null) return f(g)
      } finally reader.close()
    }
    throw new IllegalStateException(s"$dir is empty — expected at least one row")
  }
}
