package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) duplicate detection for SHORT strings — entity
  * names, titles, product codes — where token-level MinHash/SimHash have
  * nothing to shingle. Character-level cousin of the Dedup family.
  *
  * Candidate generation is the SymSpell deletion-neighborhood trick, not
  * grams: two strings with levenshtein(a, b) ≤ 1 ALWAYS share a key in
  * {s} ∪ del1(s) (equal → s; insertion → the shorter string is a deletion
  * of the longer; substitution → deleting the differing position from
  * both yields the same string), so recall is exact by construction —
  * unlike char-gram blocking, which collapses under shared prefixes
  * ("Customer#0000...") into all-pairs buckets. Keys are near-unique, the
  * join is an equi-join, and the final levenshtein verify removes the
  * false positives (e.g. transpositions at distance 2).
  *
  * Scale shape: explode ×(len+1) keys per row → hash equi-join → distinct
  * candidate pairs → one levenshtein per candidate. No cartesian, no
  * window. Contract: collapse EXACT duplicates first (Dedup.exact*) — a
  * value shared verbatim by m rows legitimately forms m² pairs and will
  * dominate the candidate set. */
object Fuzzy {

  /** The deletion neighborhood of `s` at distance 1: s plus every string
    * obtained by deleting one character, deduplicated (deleting any of a
    * run of equal chars gives the same string). */
  def deletionKeys(s: Column): Column = {
    val del = transform(
      sequence(lit(0), length(s) - 1),
      i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))
    array_distinct(concat(array(s), when(length(s) > 0, del).otherwise(array())))
  }

  /** All pairs (id_a < id_b) whose `strCol` values are within levenshtein
    * distance 1, with the distance. Null strings never match. */
  def fuzzyPairsD1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // normalize names in their own projection: referencing an alias born
    // in the same select from inside the transform() lambda would resolve
    // as a LateralColumnAliasReference, which generators reject
    val keyed = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"), explode(deletionKeys(col("s"))).as("dk"))
    val a = keyed.select(col("dk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keyed.select(col("dk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("dk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b")
      .distinct() // a pair can share several deletion keys — verify once
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
