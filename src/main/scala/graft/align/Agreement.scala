package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement over rating tables — the data-QA gate every
  * preference/label collection runs before its ratings feed
  * [[Preference]] pair construction or reward-model training:
  *
  *   - [[cohenKappa]]: two-rater chance-corrected agreement
  *     (Cohen 1960) over the items both raters labeled.
  *   - [[fleissKappa]]: many-rater agreement (Fleiss 1971) in the
  *     variable-rater-count generalization — per-item observed
  *     agreement among that item's own ratings, chance agreement from
  *     the pooled label distribution.
  *
  * Both return ONE summary row with the intermediate terms (observed /
  * chance agreement) exposed, so thresholds can gate on any of them and
  * the arithmetic replays cross-engine. Agreement components are
  * rounded to 6 decimals (the library's cross-engine score unit) BEFORE
  * the final kappa, which is then rounded again — the perplexity-oracle
  * convention that keeps summation-order ulp noise out of the hash.
  *
  * Scale shapes: everything reduces to keyed groupBys over the ratings
  * table (items, then labels) and single-row aggregates joined by
  * crossJoin — no windows, no driver state, no all-pairs. A 100 TB
  * rating log costs one shuffle per aggregation level.
  *
  * No counterpart in the reference (a tabular classification pipeline);
  * extension surface for the LLM-training-data brief, from published
  * formulas only. */
object Agreement {

  /** Cohen's kappa between raters `raterA` and `raterB` over the items
    * BOTH rated (inner join on the item): κ = (p_o − p_e) / (1 − p_e),
    * p_o = fraction of co-rated items with equal labels, p_e = Σ_c
    * p_A(c)·p_B(c) from each rater's own marginal over the co-rated
    * set. One rating per (item, rater) is the input contract —
    * duplicate ratings would multiply through the join.
    *
    * Output (single row): n_items, po, pe, kappa — kappa is null when
    * p_e = 1 (a constant-label degenerate table, where kappa is
    * undefined) or when no co-rated items exist. */
  def cohenKappa(
      ratings: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String,
      raterA: String,
      raterB: String): DataFrame = {
    require(raterA != raterB, s"raters must differ, got '$raterA' twice")
    def side(r: String, as: String) =
      ratings.filter(col(raterCol) === r)
        .select(col(itemCol).as("__it"), col(labelCol).cast("string").as(as))
    val j = side(raterA, "__a").join(side(raterB, "__b"), Seq("__it"))
    val base = j.agg(
      count(lit(1)).as("n_items"),
      round(avg(when(col("__a") === col("__b"), 1.0).otherwise(0.0)), 6).as("po"))
    // p_e from the marginal counts over the SAME co-rated set; labels
    // one rater never used contribute 0 (the inner label join drops them)
    val cross = j.groupBy(col("__a").as("__l")).agg(count(lit(1)).as("__na"))
      .join(j.groupBy(col("__b").as("__l")).agg(count(lit(1)).as("__nb")), Seq("__l"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__ab"))
    base.crossJoin(cross)
      .select(
        col("n_items"),
        col("po"),
        round(col("__ab") / (col("n_items") * col("n_items")), 6).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)))
  }

  /** Krippendorff's alpha (nominal data) over a (item, label) rating
    * log — the agreement statistic built for exactly the missing-data
    * shape crowdsourced ratings have (any rater count per item, rater
    * identity irrelevant; Krippendorff 2004). Via the coincidence
    * construction: items with n_i ≥ 2 ratings contribute
    * o_cc = Σ_i n_ic(n_ic−1)/(n_i−1) observed same-label mass over
    * n = Σ n_i total mass, with marginals n_c = Σ_i n_ic;
    * D_o = 1 − Σ_c o_cc/n, D_e = 1 − Σ_c n_c(n_c−1)/(n(n−1)),
    * α = 1 − D_o/D_e. Singleton items carry no pairable information
    * and are excluded (the statistic's own convention).
    *
    * Output (single row): n_items, n_ratings, d_o, d_e, alpha — alpha
    * null when D_e = 0 (all mass on one label) or nothing retained.
    * D_o/D_e rounded to 6 decimals before the final division. */
  def krippendorffAlpha(
      ratings: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val cnt = ratings.groupBy(
      col(itemCol).as("__it"), col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__nij"))
    val items = cnt.groupBy(col("__it"))
      .agg(sum(col("__nij")).as("__ni"))
      .filter(col("__ni") >= 2)
    val retained = cnt.join(items, Seq("__it"))
    val base = retained
      .groupBy(col("__it"), col("__ni"))
      .agg(sum(col("__nij") * (col("__nij") - 1)).as("__agr"))
      .agg(
        count(lit(1)).as("n_items"),
        coalesce(sum(col("__ni")), lit(0L)).as("n_ratings"),
        coalesce(sum(col("__agr").cast("double") / (col("__ni") - 1)), lit(0.0))
          .as("__occ"))
    val marg = retained
      .groupBy(col("__l"))
      .agg(sum(col("__nij")).as("__nc"))
      .agg(coalesce(sum(col("__nc") * (col("__nc") - 1)), lit(0L)).as("__mm"))
    base.crossJoin(marg)
      .select(
        col("n_items"),
        col("n_ratings"),
        round(lit(1.0) - col("__occ") / col("n_ratings"), 6).as("d_o"),
        round(lit(1.0) - col("__mm") /
          (col("n_ratings") * (col("n_ratings") - 1)), 6).as("d_e"))
      .withColumn("alpha",
        when(col("d_e") > 0 && col("n_items") > 0,
          round(lit(1.0) - col("d_o") / col("d_e"), 6)))
  }

  /** Fleiss' kappa over a (item, label) rating log — any number of
    * raters, rater identity irrelevant (Fleiss 1971), in the
    * variable-rater-count generalization: items keep their own rating
    * count n_i (items with n_i < 2 carry no agreement information and
    * are excluded), per-item agreement P_i = Σ_j n_ij(n_ij−1) /
    * (n_i(n_i−1)), P̄ = mean over retained items, and chance agreement
    * p_e = Σ_j p_j² from the pooled label shares of the retained
    * ratings. κ = (P̄ − p_e) / (1 − p_e).
    *
    * Output (single row): n_items (retained), n_ratings (retained),
    * p_bar, p_e, kappa — kappa null when p_e = 1 or nothing retained. */
  def fleissKappa(
      ratings: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val cnt = ratings.groupBy(
      col(itemCol).as("__it"), col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__nij"))
    val items = cnt.groupBy(col("__it"))
      .agg(
        sum(col("__nij")).as("__ni"),
        sum(col("__nij") * (col("__nij") - 1)).as("__agr"))
      .filter(col("__ni") >= 2)
    val base = items.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("__ni")), lit(0L)).as("n_ratings"),
      round(avg(col("__agr").cast("double") /
        (col("__ni") * (col("__ni") - 1))), 6).as("p_bar"))
    // pooled label shares over the RETAINED items only (left-semi on the
    // survivors), so p_e and P̄ describe the same population
    val pooled = cnt
      .join(items.select(col("__it")), Seq("__it"), "left_semi")
      .groupBy(col("__l"))
      .agg(sum(col("__nij")).as("__tj"))
      .agg(coalesce(sum(col("__tj") * col("__tj")), lit(0L)).as("__sq"))
    base.crossJoin(pooled)
      .select(
        col("n_items"),
        col("n_ratings"),
        col("p_bar"),
        round(col("__sq") / (col("n_ratings") * col("n_ratings")), 6).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") < 1.0 && col("n_items") > 0,
          round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")), 6)))
  }
}
