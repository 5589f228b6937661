package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels (similarity search). Pure Catalyst expressions:
  * `zip_with` + `aggregate` fold left-to-right in array order with a double
  * accumulator, which is bit-identical to the oracle's
  * `list_reduce(list_transform(list_zip(...)))` — so cosine scores
  * hash-match DuckDB exactly.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double.
    * Interpreted higher-order-function form — the portable baseline.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Codegen'd native form (graft.expressions.VecDot) — same left-to-right
    * double fold, bit-identical results, ~one primitive loop per row.
    * Requires `VectorExpressions.register(spark)` (or GraftExtensions).
    */
  def dotFast(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def normFast(a: Column): Column = sqrt(dotFast(a, a))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB mirror of [[dot]] for oracle SQL. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
