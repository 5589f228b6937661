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

  /** Split SQL into (isMasked, span) segments where masked spans are
    * single-quoted literals (with '' escapes), double-quoted strings,
    * `--` line comments and `/* */` block comments. A character scan —
    * not a regex — so an apostrophe inside a comment (`-- don't`) can
    * never be mispaired with a later literal quote (the reference walks a
    * sqlglot AST and gets all of this for free).
    */
  private def maskedSegments(sql: String): Seq[(Boolean, String)] = {
    val out = Seq.newBuilder[(Boolean, String)]
    val n = sql.length
    var i = 0
    var segStart = 0
    def flush(until: Int): Unit =
      if (until > segStart) out += ((false, sql.substring(segStart, until)))
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        flush(i)
        val q = c
        var j = i + 1
        var end = -1
        while (j < n && end < 0) {
          if (sql.charAt(j) == q) {
            // '' (or "") is an escaped quote inside the literal
            if (j + 1 < n && sql.charAt(j + 1) == q) j += 2 else end = j + 1
          } else j += 1
        }
        if (end < 0) end = n // unterminated literal: mask to EOS
        out += ((true, sql.substring(i, end)))
        i = end; segStart = end
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        flush(i)
        var end = sql.indexOf('\n', i)
        if (end < 0) end = n
        out += ((true, sql.substring(i, end)))
        i = end; segStart = end
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        flush(i)
        var end = sql.indexOf("*/", i + 2)
        end = if (end < 0) n else end + 2
        out += ((true, sql.substring(i, end)))
        i = end; segStart = end
      } else i += 1
    }
    flush(n)
    out.result()
  }

  /** F10: qualify unqualified table names with their namespace. String
    * literals and comments are masked: only the spans between them are
    * rewritten.
    */
  def qualify(sql: String, sourceTables: Set[String], targetTables: Set[String]): String = {
    val both = sourceTables.map(_.toLowerCase) intersect targetTables.map(_.toLowerCase)
    def rewrite(s: String, tables: Set[String], ns: String): String =
      tables.filterNot(t => both.contains(t.toLowerCase)).foldLeft(s) { (acc, t) =>
        identRegex(t).replaceAllIn(acc, m => s"$ns.$t")
      }
    maskedSegments(sql).map {
      case (true, span) => span
      case (false, span) =>
        rewrite(rewrite(span, sourceTables, "source"), targetTables, "target")
    }.mkString
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
