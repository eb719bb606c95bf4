package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association / co-occurrence mining over grouped event or token
  * streams — the support-counting first pass of A-Priori, which is
  * also the useful 90% of it for corpus QA ("which event types /
  * tags / sources travel together?").
  */
object Association {

  /** Co-occurrence pair census: for each unordered pair of distinct
    * `item` values that appear within the same `group` (session,
    * user-day, document), the number of groups containing both;
    * pairs below `minSupport` groups are dropped.
    *
    * Scale shape: the input first collapses to DISTINCT
    * (group, item) — one shuffle, after which each group carries at
    * most |item domain| rows no matter how many raw events it had.
    * Pair generation is then a self-equi-join on the group key
    * (co-partitioned: both sides are the same collapsed frame, so
    * the sort/partitioning is reused) with `item_a < item_b` keeping
    * each unordered pair once, and the final support count
    * partial-aggregates map-side. Per-group work is quadratic in the
    * group's DISTINCT item count — bounded by the item domain, not
    * by group activity; for open-ended domains (raw tokens) cap
    * items per group first ([[graft.operators.Sampling.capPerGroup]])
    * or the one mega-group becomes the straggler.
    *
    * Null items are excluded (a null "item" is absence, not a
    * co-occurring thing). Group keys compare with Spark's JOIN
    * equality, which is type-dependent: a top-level NULL group never
    * joins (its rows silently contribute no pairs), while a STRUCT
    * group whose fields are NULL compares field-wise null-safe and
    * forms a real group. Callers composing struct group keys from
    * nullable columns should fence them upstream
    * (`filter(c.isNotNull)`) if null-keyed groups are not wanted.
    */
  def coOccurrencePairs(
      df: DataFrame, group: Column, item: Column,
      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val gi = df
      .filter(item.isNotNull)
      .select(group.as("_g"), item.as("_i"))
      .distinct()
    val a = gi.select(col("_g"), col("_i").as("item_a"))
    val b = gi.select(col("_g"), col("_i").as("item_b"))
    a.join(b, Seq("_g"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minSupport)
  }

  /** Association scoring over the pair census — the "step 2" of
    * A-Priori: per unordered pair, its support plus the marginals and
    * the derived strength measures
    *
    *   lift       = n_groups · n_total / (n_a · n_b)
    *   conf_a_b   = n_groups / n_a   (P(b | a))
    *   conf_b_a   = n_groups / n_b
    *
    * lift > 1 means the pair travels together more than independence
    * predicts. All inputs are exact integers and each measure is one
    * correctly-rounded double operation away from them (products fold
    * inside the numerator while still integer-exact below 2^53), so
    * the scores are bit-identical across engines and partitionings —
    * deliberately NO log-PMI here, a transcendental would not be.
    *
    * Scale shape: one extra shuffle beyond [[coOccurrencePairs]] — the
    * per-item marginals fold map-side to |item domain| rows and join
    * the pair table broadcast; the total-group count is a 1-row
    * broadcast. Null handling and the group-key caveat are inherited
    * from [[coOccurrencePairs]].
    */
  def pairLift(
      df: DataFrame, group: Column, item: Column,
      minSupport: Long = 1L): DataFrame = {
    val gi = df
      .filter(item.isNotNull)
      .select(group.as("_g"), item.as("_i"))
      .distinct()
    val pairs = coOccurrencePairs(df, group, item, minSupport)
    val marg = gi.groupBy(col("_i")).agg(count(lit(1)).as("_n_i"))
    val total = gi.select(count_distinct(col("_g")).as("_n_total"))
    pairs
      .join(broadcast(marg.select(col("_i").as("item_a"), col("_n_i").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(marg.select(col("_i").as("item_b"), col("_n_i").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(
        col("item_a"), col("item_b"), col("n_groups"),
        col("n_a"), col("n_b"), col("_n_total").as("n_total"),
        ((col("n_groups") * col("_n_total")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"),
        (col("n_groups").cast("double") / col("n_a").cast("double")).as("conf_a_b"),
        (col("n_groups").cast("double") / col("n_b").cast("double")).as("conf_b_a"))
  }
}
