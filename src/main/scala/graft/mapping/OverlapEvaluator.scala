package graft.mapping

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Model._

/** Tuple-overlap evaluation + constraint audits for the schema-mapping
  * pipeline (SURVEY §2.H4, D9, D10; behavior of
  * `Schema Mapping/AnalysisUtils/Evaluator.py:126-238`,
  * `DatabaseUtils/DatabaseManager.py:149-200`).
  */
object OverlapEvaluator {

  final case class Overlap(relation: String, tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val (p, r) = (precision, recall)
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
    /** empty-vs-empty counts as perfect (AnaylsisUtils.py:11-12). */
    def isAllZero: Boolean = tp == 0 && fp == 0 && fn == 0
  }

  /** H4: SET-semantics tuple overlap of predicted vs gold, projected to
    * the relation's meaningful attributes (B7: surrogate PKs excluded,
    * Evaluator.py:194-203). TP = pred ∩ gold, FP = pred − gold,
    * FN = gold − pred — DISTINCT semantics exactly like SQLite
    * EXCEPT/INTERSECT (SURVEY §7.4.3).
    */
  def tableOverlap(pred: DataFrame, gold: DataFrame, rel: Relation): Overlap = {
    val cols = rel.attributes.filter(_.meaningful).map(a => col(a.name))
    val p = pred.select(cols: _*)
    val g = gold.select(cols: _*)
    Overlap(rel.name,
      tp = p.intersect(g).count(),
      fp = p.except(g).count(),
      fn = g.except(p).count())
  }

  /** Timeout scoring rule: FN = |gold|, FP = ∞ (Evaluator.py:142-151). */
  def timeoutOverlap(gold: DataFrame, rel: Relation): Overlap = {
    val cols = rel.attributes.filter(_.meaningful).map(a => col(a.name))
    Overlap(rel.name, tp = 0, fp = Long.MaxValue,
      fn = gold.select(cols: _*).distinct().count())
  }

  /** D9: rows in excess of uniqueness over a declared key set. */
  def uniquenessViolations(df: DataFrame, key: Seq[String]): Long =
    df.groupBy(key.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)))
      .head().getLong(0)

  final case class Audit(
      relation: String,
      nullViolations: Long,
      typeViolations: Long,
      sizeViolations: Long,
      uniqueViolations: Long)

  /** D10: nullable / type / size / uniqueness audit of a produced table
    * against the declared relation (DatabaseManager.py:163-200). Type
    * check: INTEGER attrs must hold integral values; DOUBLE numeric;
    * TEXT anything. Values are audited in their string form, mirroring
    * the reference's string-typed imports (isdecimal → `^[0-9]+$`,
    * DatabaseManager.py:188-189).
    */
  def audit(df: DataFrame, rel: Relation): Audit = {
    val nullCond = rel.attributes.filterNot(_.nullable)
      .map(a => when(col(a.name).isNull, 1).otherwise(0))
    val typeCond = rel.attributes.map { a =>
      superType(a.dataType) match {
        case "INTEGER" =>
          when(col(a.name).isNotNull &&
            !col(a.name).cast("string").rlike("^-?[0-9]+$"), 1).otherwise(0)
        case "DOUBLE" =>
          when(col(a.name).isNotNull && col(a.name).cast("double").isNull, 1).otherwise(0)
        case _ => lit(0)
      }
    }
    val sizeCond = rel.attributes.collect {
      case a if a.size.isDefined =>
        when(length(col(a.name).cast("string")) > a.size.get, 1).otherwise(0)
    }
    def total(conds: Seq[org.apache.spark.sql.Column]): Long =
      if (conds.isEmpty) 0L
      else df.agg(sum(conds.reduce(_ + _)).cast("long")).head().get(0) match {
        case null => 0L
        case v: Long => v
      }
    val uniq =
      (rel.primaryKey +: rel.uniques.map(identity)).filter(_.nonEmpty)
        .map(k => uniquenessViolations(df, k)).sum
    Audit(rel.name, total(nullCond), total(typeCond), total(sizeCond), uniq)
  }

  /** Catalog setup: the reference's attached `source`/`target`/`gold_target`
    * SQLite namespaces become Spark databases (SURVEY §2.A9/A10).
    */
  def createNamespaces(spark: SparkSession, dbs: Seq[String] = Seq("source", "target", "gold_target")): Unit =
    dbs.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`"))

  def registerTable(spark: SparkSession, db: String, rel: Relation, data: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`${rel.name}`")
    data.write.mode("overwrite").saveAsTable(s"`$db`.`${rel.name}`")
  }
}
