package graft

import java.nio.charset.StandardCharsets

import graft.io.TfRecord
import org.apache.spark.sql.functions._

/** TFRecord shards: framing bytes and masked CRC32C pinned by hand
  * against the published wire format, tf.Example proto round-trip,
  * distributed write/read, and corrupt-shard failures. */
class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  test("record framing: length, masked CRC32C and payload are byte-exact") {
    // independently computed: crc32c little-endian framing of "hello"
    val e = TfRecord.record("hello".getBytes(StandardCharsets.UTF_8))
    assert(e.map("%02x".format(_)).mkString ===
      "0500000000000000" + "eab2043e" + "68656c6c6f" + "bb1f1c19")
    val back = TfRecord.records(
      new java.io.ByteArrayInputStream(e ++ TfRecord.record("x".getBytes)), "mem")
      .toSeq
    assert(back.map(b => new String(b, StandardCharsets.UTF_8)) === Seq("hello", "x"))
  }

  test("tf.Example proto: features round-trip through our encoder/parser") {
    val ex = TfRecord.exampleBytes(Seq(
      "text" -> TfRecord.featureBytes(Left("héllo".getBytes(StandardCharsets.UTF_8))),
      "doc_id" -> TfRecord.featureBytes(Right(Right(Seq(42L, 300L)))),
      "score" -> TfRecord.featureBytes(Right(Left(Seq(1.5f, -2.25f))))))
    val m = TfRecord.parseExample(ex)
    assert(new String(m("text").asInstanceOf[Array[Byte]],
      StandardCharsets.UTF_8) === "héllo")
    assert(m("doc_id") === Seq(42L, 300L))
    assert(m("score") === Seq(1.5f, -2.25f))
  }

  test("shards round-trip: typed features, sharding, deterministic bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr").toString
    val rows = (0 until 25).map(i => (i.toLong, s"text $i é中", i * 0.5))
      .toDF("doc_id", "text", "score")
    TfRecord.writeShards(rows.repartition(2), s"$dir/out",
      Seq("doc_id", "text", "score"), rowsPerShard = 10)
    val shardFiles = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).sortBy(_.getName)
    assert(shardFiles.length >= 4, s"25 rows / 10-per-shard over 2 partitions: ${shardFiles.length}")
    val back = TfRecord.readExamples(spark, Seq(s"$dir/out"),
      Seq("doc_id" -> "long", "text" -> "string", "score" -> "float"))
    assert(back.count() === 25)
    val byId = back.select($"doc_id", $"text", $"score")
      .as[(Long, String, Float)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(7L) === (("text 7 é中", 3.5f)))
    // identical input -> identical shard bytes (reproducibility contract)
    TfRecord.writeShards(rows.repartition(2), s"$dir/out2",
      Seq("doc_id", "text", "score"), rowsPerShard = 10)
    val a = shardFiles.map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    val b = new java.io.File(s"$dir/out2").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("array features export as whole Int64/Float lists and round-trip (r17)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-arr").toString
    // the packed-sequence shape: token_ids per record, plus a float list
    // and an empty array (valid: empty list on the wire decodes as null,
    // the documented convention) and a NULL array (absent feature)
    val rows = Seq(
      (1L, Seq(5, 7, 11), Seq(0.5, 1.5)),
      (2L, Seq(13), Seq.empty[Double]),
      (3L, Seq.empty[Int], Seq(2.5))).toDF("seq_id", "token_ids", "weights")
      .unionByName(Seq(4L).toDF("seq_id")
        .withColumn("token_ids", lit(null).cast("array<int>"))
        .withColumn("weights", lit(null).cast("array<double>")))
    TfRecord.writeShards(rows, s"$dir/out",
      Seq("seq_id", "token_ids", "weights"), rowsPerShard = 10)
    val back = TfRecord.readExamples(spark, Seq(s"$dir/out"),
      Seq("seq_id" -> "long", "token_ids" -> "longs", "weights" -> "floats"))
      .collect().map(r => r.getAs[Long]("seq_id") ->
        ((Option(r.getAs[scala.collection.Seq[Long]]("token_ids")),
          Option(r.getAs[scala.collection.Seq[Float]]("weights"))))).toMap
    assert(back(1L) === ((Some(Seq(5L, 7L, 11L)), Some(Seq(0.5f, 1.5f)))))
    assert(back(2L)._1 === Some(Seq(13L)))
    assert(back(2L)._2.forall(_.isEmpty), "empty list decodes empty-or-null")
    assert(back(3L)._1.forall(_.isEmpty))
    assert(back(3L)._2 === Some(Seq(2.5f)))
    assert(back(4L) === ((None, None)), "null array = absent feature")
    // a null ELEMENT has no tf.Example slot — the export fails loudly,
    // never silently drops or zero-fills the hole
    val bad = Seq((9L, Seq(Some(1), None, Some(3))))
      .toDF("seq_id", "token_ids")
    val e = intercept[Exception] {
      TfRecord.writeShards(bad, s"$dir/bad", Seq("seq_id", "token_ids"))
    }
    assert(Option(e.getMessage).getOrElse(e.getCause.getMessage)
      .contains("null element"))
  }

  test("re-export to the same dir replaces stale shards (overwrite semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-ow").toString
    val big = (0 until 25).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    TfRecord.writeShards(big.repartition(2), s"$dir/out",
      Seq("doc_id", "text"), rowsPerShard = 5)
    // fewer rows AND fewer partitions: the old layout has strictly more
    // shard files — a non-clearing writer would leave them behind
    val small = (0 until 3).map(i => (i.toLong, s"s$i")).toDF("doc_id", "text")
    TfRecord.writeShards(small.repartition(1), s"$dir/out",
      Seq("doc_id", "text"), rowsPerShard = 5)
    val back = TfRecord.readExamples(spark, Seq(s"$dir/out"),
      Seq("doc_id" -> "long", "text" -> "string"))
    assert(back.count() === 3)
    assert(back.select($"text").as[String].collect().toSet === Set("s0", "s1", "s2"))
    // SELF-REFERENTIAL re-export: input reads the very directory being
    // overwritten — write-then-publish means the job still sees the old
    // shards while running (a delete-first writer would destroy its own
    // input and export zero rows)
    val selfRef = TfRecord.readExamples(spark, Seq(s"$dir/out"),
      Seq("doc_id" -> "long", "text" -> "string"))
      .filter($"doc_id" < 2)
      .select($"doc_id", $"text")
    TfRecord.writeShards(selfRef, s"$dir/out", Seq("doc_id", "text"))
    val after = TfRecord.readExamples(spark, Seq(s"$dir/out"),
      Seq("doc_id" -> "long", "text" -> "string"))
    assert(after.select($"text").as[String].collect().toSet === Set("s0", "s1"))
    // no staging leftovers
    assert(!new java.io.File(s"$dir/out").listFiles().exists(_.getName.startsWith(".staging")))
  }

  test("empty numeric lists on the wire decode as null, like absent features") {
    // a third-party writer may emit Int64List/FloatList with zero values —
    // valid proto; the parser returns an empty Seq and readExamples nulls it
    val ex = TfRecord.exampleBytes(Seq(
      "doc_id" -> TfRecord.featureBytes(Right(Right(Seq.empty[Long]))),
      "score" -> TfRecord.featureBytes(Right(Left(Seq.empty[Float]))),
      "text" -> TfRecord.featureBytes(Left("ok".getBytes(StandardCharsets.UTF_8)))))
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-empty").toString
    val f = java.nio.file.Paths.get(dir, "shard-00000-0000.tfrecord")
    java.nio.file.Files.write(f, TfRecord.record(ex))
    val row = TfRecord.readExamples(spark, Seq(dir),
      Seq("doc_id" -> "long", "score" -> "float", "text" -> "string"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("doc_id")))
    assert(row.isNullAt(row.fieldIndex("score")))
    assert(row.getAs[String]("text") === "ok")
  }

  test("loud failures: unsupported column type, corrupt CRC, truncation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-err").toString
    val typeErr = intercept[IllegalArgumentException] {
      TfRecord.writeShards(
        Seq((1L, Seq("a", "b"))).toDF("id", "arr"), s"$dir/bad", Seq("arr"))
    }
    assert(typeErr.getMessage.contains("'arr'"))
    val good = TfRecord.record("abc".getBytes)
    val corrupt = good.clone(); corrupt(corrupt.length - 1) = (corrupt.last ^ 1).toByte
    val crcErr = intercept[IllegalArgumentException] {
      TfRecord.records(new java.io.ByteArrayInputStream(corrupt), "mem").toSeq
    }
    assert(crcErr.getMessage.contains("CRC"))
    intercept[java.io.EOFException] {
      TfRecord.records(
        new java.io.ByteArrayInputStream(good.take(good.length - 2)), "mem").toSeq
    }
  }
}
