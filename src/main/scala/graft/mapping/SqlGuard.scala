package graft.mapping

import java.util.UUID
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.util.matching.Regex
import org.apache.spark.sql.SparkSession

/** Guarded execution of LLM-generated SQL (SURVEY §2.B6/F10/C7; behavior
  * of `Schema Mapping/AnalysisUtils/Evaluator.py:59-119` +
  * `DatabaseUtils/DatabaseManager.py:202-238`).
  *
  *   - statement triage: only INSERT/UPDATE/DELETE/CREATE VIEW/SELECT pass;
  *     CREATE SCHEMA and CREATE/DROP of protected target tables are
  *     silently dropped (the reference protects its target DDL the same
  *     way, Evaluator.py:75-87);
  *   - namespace qualification: unqualified table identifiers get the
  *     `source`/`target` database prefix by membership — names present in
  *     BOTH schemas are left untouched (Evaluator.py:100-101);
  *   - timeout: the job group is cancelled after `timeoutSec`, the
  *     reference's 30 s SQLite interrupt re-expressed as
  *     `cancelJobGroup` (DatabaseManager.py:202-238). A timeout is
  *     reported, not thrown — the evaluator scores it as FN=|gold|, FP=∞.
  */
object SqlGuard {

  sealed trait Outcome
  final case class Ok(statementsRun: Int) extends Outcome
  final case class TimedOut(afterSec: Long) extends Outcome
  final case class Failed(error: String) extends Outcome

  private val allowedHead: Regex =
    """(?is)^\s*(?:INSERT|UPDATE|DELETE|CREATE\s+VIEW|SELECT|WITH)\b.*""".r
  private val protectedDdl: Regex =
    """(?is)^\s*(?:CREATE\s+(?:TABLE|SCHEMA|DATABASE)|DROP)\b.*""".r

  /** B6: keep only executable DML/SELECT statements. */
  def triage(statements: Seq[String]): Seq[String] =
    statements.map(_.trim).filter(_.nonEmpty)
      .filterNot(protectedDdl.matches(_))
      .filter(allowedHead.matches(_))

  // identifier positions we must NOT qualify: after a dot, or part of a
  // function call. This is a lexical pass like the reference's sqlglot
  // node walk — good enough for generated SELECT/INSERT SQL.
  private def identRegex(name: String): Regex =
    s"(?i)(?<![\\w.`])${Regex.quote(name)}(?![\\w`(])".r

  // single-quoted string literals (with '' escapes): identifier rewriting
  // must never reach inside these — a literal like 'visit to orders dept'
  // is data, not a table reference (the reference's sqlglot AST walk gets
  // this for free; a lexical pass has to mask the spans explicitly)
  private val literalSpan: Regex = "'(?:[^']|'')*'".r

  /** F10: qualify unqualified table names with their namespace. String
    * literals are masked: only the spans between them are rewritten.
    */
  def qualify(sql: String, sourceTables: Set[String], targetTables: Set[String]): String = {
    val both = sourceTables.map(_.toLowerCase) intersect targetTables.map(_.toLowerCase)
    def rewrite(s: String, tables: Set[String], ns: String): String =
      tables.filterNot(t => both.contains(t.toLowerCase)).foldLeft(s) { (acc, t) =>
        identRegex(t).replaceAllIn(acc, m => s"$ns.$t")
      }
    def rewriteSegment(s: String): String =
      rewrite(rewrite(s, sourceTables, "source"), targetTables, "target")
    val sb = new StringBuilder
    var last = 0
    for (m <- literalSpan.findAllMatchIn(sql)) {
      sb.append(rewriteSegment(sql.substring(last, m.start)))
      sb.append(m.matched)
      last = m.end
    }
    sb.append(rewriteSegment(sql.substring(last)))
    sb.toString
  }

  /** Execute a script of statements with a wall-clock budget enforced via
    * job-group cancellation.
    */
  def execute(
      spark: SparkSession,
      statements: Seq[String],
      timeoutSec: Long = 30): Outcome = {
    val group = s"sqlguard-${UUID.randomUUID()}"
    val pool = Executors.newSingleThreadExecutor()
    val task = pool.submit(new java.util.concurrent.Callable[Outcome] {
      override def call(): Outcome = {
        spark.sparkContext.setJobGroup(group, "guarded generated-SQL execution",
          interruptOnCancel = true)
        try {
          var n = 0
          statements.foreach { s =>
            val df = spark.sql(s)
            // force actions for side-effect-free SELECTs too (parity with
            // the reference, which fetches results)
            if (s.trim.toUpperCase.startsWith("SELECT") ||
                s.trim.toUpperCase.startsWith("WITH")) df.collect()
            n += 1
          }
          Ok(n)
        } finally spark.sparkContext.clearJobGroup()
      }
    })
    try task.get(timeoutSec, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        task.cancel(true)
        TimedOut(timeoutSec)
      case e: java.util.concurrent.ExecutionException =>
        Failed(Option(e.getCause).getOrElse(e).getMessage)
    } finally pool.shutdownNow()
  }
}
