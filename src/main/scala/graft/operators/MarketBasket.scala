package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket pair machinery shared by q232 (association rules), q242
  * (item-item CF) and q243 (clustering coefficient on the co-purchase
  * graph).
  *
  * Pair generation is a basket-key-local self-join, so fan-out is
  * Σ C(|basket|,2) — linear in baskets only while basket sizes are
  * bounded. TPC-H orders carry ≤7 lines, but a real 100 TB event log has
  * power-law baskets: one 100k-item basket would emit 5×10⁹ pairs inside
  * a single task. The cap below is therefore ENFORCED IN CODE, not left
  * as deployment hygiene: [[capped]] drops baskets larger than
  * [[BasketCap]] before any pair expansion, and every consumer's DuckDB
  * oracle mirrors the same cut so the gate verifies the capped semantics.
  *
  * The cap is applied with a count window PARTITIONED BY THE BASKET KEY
  * (never unpartitioned — PlanShapeSpec's global window sweep rejects
  * that, and its q232 test pins the basket-key partitioning explicitly):
  * one hash shuffle on the same key the downstream pair self-join uses,
  * inside the basket frame that q232 computes once and caches.
  */
object MarketBasket {

  /** Baskets above this size are excluded from pair generation entirely.
    * 500 items ⇒ worst-case C(500,2) ≈ 125k pairs per basket — a bounded
    * task, while keeping every plausibly-intentional basket. Mirrored
    * verbatim in the q232/q242/q243 oracles.
    */
  val BasketCap = 500

  /** Distinct (basket, item) pairs from `lineitem`, capped at
    * [[BasketCap]] items per basket.
    */
  def cappedBaskets(lineitem: DataFrame, cap: Int = BasketCap): DataFrame =
    capped(
      lineitem.select(col("l_orderkey"), col("l_partkey")).distinct(),
      "l_orderkey", cap)

  /** Drop baskets with more than `cap` distinct items. The input must
    * already be distinct on (orderCol, itemCol).
    */
  def capped(baskets: DataFrame, orderCol: String,
      cap: Int = BasketCap): DataFrame = {
    val w = Window.partitionBy(col(orderCol))
    baskets
      .withColumn("graft_bsz", count(lit(1)).over(w))
      .filter(col("graft_bsz") <= cap)
      .drop("graft_bsz")
  }

  /** Co-occurrence counts over capped baskets: one row per unordered item
    * pair (itemA < itemB) with its basket-support count, min-support
    * pruned. Columns: part_a, part_b, sup_cnt.
    */
  def pairCounts(baskets: DataFrame, orderCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val a = baskets.as("a")
    val b = baskets.as("b")
    a.join(b,
        col(s"a.$orderCol") === col(s"b.$orderCol") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .groupBy(col(s"a.$itemCol").as("part_a"),
        col(s"b.$itemCol").as("part_b"))
      .agg(count(lit(1)).as("sup_cnt"))
      .filter(col("sup_cnt") >= minSupport)
  }

  /** The oracle-side mirror of [[cappedBaskets]] as a DuckDB CTE body —
    * kept here so all three query oracles share one definition.
    */
  def oracleCappedBasketsCte(cap: Int = BasketCap): String =
    s"""baskets0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       baskets AS (SELECT l_orderkey, l_partkey FROM (
           SELECT l_orderkey, l_partkey,
             count(*) OVER (PARTITION BY l_orderkey) AS bsz FROM baskets0) z
         WHERE bsz <= $cap)"""
}
