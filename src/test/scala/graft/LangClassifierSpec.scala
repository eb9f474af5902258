package graft

import graft.text.LangClassifier
import org.apache.spark.sql.functions._

/** Learned language ID: 26-language seed corpus separates under the
  * hashed char-n-gram model, held-out recombinations classify correctly,
  * the model round-trips through disk, scoring needs no label column,
  * and predictions agree with the Unicode script profile. */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def heldOut = {
    val seeds = LangClassifier.seedCorpus(spark)
    // eval texts recombine phrases at offset 3 — pairs the training set
    // (singles + offset-1 pairs) never contains
    seeds.as("a").join(seeds.as("b"),
        col("a.lang") === col("b.lang") &&
          pmod(col("a.phrase_no") + 3, lit(8)) === col("b.phrase_no"))
      .select(col("a.lang").as("lang"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"))
  }

  private def trainFrame = {
    val seeds = LangClassifier.seedCorpus(spark)
    val pairs = seeds.as("a").join(seeds.as("b"),
        col("a.lang") === col("b.lang") &&
          pmod(col("a.phrase_no") + 1, lit(8)) === col("b.phrase_no"))
      .select(col("a.lang").as("lang"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"))
    seeds.select($"lang", $"text").unionByName(pairs).repartition(4)
  }

  test("26 languages train and the held-out recombinations classify exactly") {
    val model = LangClassifier.train(trainFrame, "text", "lang",
      numFeatures = 1 << 16, maxIter = 30)
    val scored = LangClassifier.score(heldOut, model)
    assert(scored.count() === 26L * 8)
    val wrong = scored.filter($"lang_pred" =!= $"lang")
      .select($"lang", $"lang_pred", $"text").collect()
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString("; ")}")
    // probabilities are real probabilities
    assert(scored.filter($"lang_prob" < 0.0 || $"lang_prob" > 1.0).count() === 0)
  }

  test("model round-trips through disk; scoring needs no label column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-langclf").toString
    val model = LangClassifier.train(trainFrame, "text", "lang",
      numFeatures = 1 << 16, maxIter = 30)
    LangClassifier.saveModel(model, s"$dir/m")
    val back = LangClassifier.loadModel(s"$dir/m")
    val unlabeled = heldOut.select($"text") // no lang column at all
    val scored = LangClassifier.score(unlabeled, back)
    assert(scored.columns.toSet === Set("text", "lang_pred", "lang_prob"))
    val a = LangClassifier.score(heldOut, model)
      .select($"text", $"lang_pred").as[(String, String)].collect().toMap
    val b = scored.select($"text", $"lang_pred").as[(String, String)].collect().toMap
    assert(a === b, "persisted model must score identically")
  }

  test("null text scores as the empty document instead of NPE-ing in HashingTF") {
    val tiny = Seq(
      ("the cat and the dog and the house", "en"),
      ("le chat et le chien et la maison", "fr")).toDF("text", "lang")
    val model = LangClassifier.train(tiny, "text", "lang",
      numFeatures = 1 << 12, maxIter = 5)
    val scored = LangClassifier.score(
      Seq(Option("the cat"), None).toDF("text"), model)
    assert(scored.count() === 2) // the null row survives with a prediction
    assert(scored.filter($"lang_pred".isNull).count() === 0)
  }

  test("predictions agree with the Unicode script profile cross-check") {
    val model = LangClassifier.train(trainFrame, "text", "lang",
      numFeatures = 1 << 16, maxIter = 30)
    val scored = LangClassifier.score(heldOut, model)
      .withColumn("doc_id", monotonically_increasing_id())
    val profiled = graft.text.TextAnalysis
      .scriptProfile(scored.select($"doc_id", $"text"), "doc_id", "text")
      .join(scored.select($"doc_id", $"lang_pred"), Seq("doc_id"))
    val expectedScript = Map(
      "ru" -> Set("cyrillic"), "uk" -> Set("cyrillic"), "el" -> Set("greek"),
      "ar" -> Set("arabic"), "he" -> Set("hebrew"), "hi" -> Set("devanagari"),
      "zh" -> Set("han"), "ko" -> Set("hangul"), "ja" -> Set("han", "kana"))
    val off = profiled
      .select($"lang_pred", $"dominant_script").collect()
      .filter { r =>
        val lp = r.getString(0)
        expectedScript.get(lp).exists(ok => !ok.contains(r.getString(1))) ||
          (!expectedScript.contains(lp) && r.getString(1) != "latin")
      }
    assert(off.isEmpty, s"script-inconsistent predictions: ${off.mkString("; ")}")
  }
}
