package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}

/** Hilbert-curve index for multi-dimensional data layout — ZOrder's
  * sibling with strictly better locality: the Hilbert curve is
  * CONTINUOUS (consecutive indices are always Manhattan-distance-1
  * neighbours, where the Z curve takes long diagonal jumps at power-of-2
  * boundaries), so the bounding box of a contiguous index range is
  * tighter on average — the reason lakehouse engines offer Hilbert
  * clustering as the upgrade over OPTIMIZE ZORDER BY.
  *
  * The index is the public iterative xy→d walk (per level: quadrant
  * digit via the Gray code (3·rx)⊕ry, then the reflect+swap rotation).
  * Unlike the Morton interleave it carries (x, y) STATE between levels,
  * so it is generated as a CHAIN of per-level simultaneous column
  * updates rather than one flat expression: [[withIndex]] folds the
  * chain as Spark `withColumns` stages (simultaneous semantics — each
  * level's (d, x, y) read the previous level's values; all inside
  * whole-stage codegen, ~10 integer CASEs per level, no shuffle) and
  * [[indexSql]] emits the SAME per-level texts as nested DuckDB
  * subquery stages with level-numbered aliases (DuckDB permits lateral
  * alias references in a select list, so shadowed names would be
  * ambiguous — numbering sidesteps it). Both sides derive from one
  * [[levelSql]] generator; [[xy2d]] is the plain-Scala twin the specs
  * cross-check against.
  */
object Hilbert {

  val Bits = 8

  /** Plain-Scala reference walk (specs + property tests). */
  def xy2d(bits: Int, x0: Int, y0: Int): Long = {
    val n = 1 << bits
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n,
      s"($x0, $y0) outside the $n-grid")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** One level's (d, x, y) update texts over the given column names —
    * valid verbatim in Spark SQL and DuckDB. `(3·rx)⊕ry` and the
    * reflect(n−1−·)+swap rotation are spelled as CASEs so neither engine
    * needs a bitwise-xor operator.
    */
  def levelSql(s: Int, bits: Int, hd: String, hx: String,
      hy: String): (String, String, String) = {
    val n1 = (1 << bits) - 1
    val rx = s"(CASE WHEN (($hx) & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (($hy) & $s) > 0 THEN 1 ELSE 0 END)"
    val d = s"$hd + ${s.toLong * s} * (CASE WHEN $rx = 1 AND $ry = 1 THEN 2 " +
      s"WHEN $rx = 1 THEN 3 WHEN $ry = 1 THEN 1 ELSE 0 END)"
    val x = s"CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN $n1 - ($hy) ELSE $hy END) ELSE $hx END"
    val y = s"CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN $n1 - ($hx) ELSE $hx END) ELSE $hy END"
    (d, x, y)
  }

  /** Level sizes high bit → 1. */
  def levels(bits: Int): Seq[Int] = (bits - 1 to 0 by -1).map(1 << _)

  /** Spark: append `out` = Hilbert index of (xCol, yCol), each already
    * normalized to [0, 2^bits). Every stage is a simultaneous
    * `withColumns` (the three updates read the PREVIOUS level's values).
    */
  def withIndex(df: DataFrame, xCol: String, yCol: String, out: String,
      bits: Int = Bits): DataFrame = {
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (s <- levels(bits)) {
      val (d, x, y) = levelSql(s, bits, "__hd", "__hx", "__hy")
      cur = cur.withColumns(Map(
        "__hd" -> expr(d), "__hx" -> expr(x), "__hy" -> expr(y)))
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** DuckDB replay: the same level chain as nested subquery stages over
    * `baseSql` (which must expose columns `hx`, `hy` plus the carried
    * columns); returns a SELECT producing carry + `hd`.
    */
  def indexSql(baseSql: String, carry: Seq[String], bits: Int = Bits): String = {
    val c = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    var cur = s"SELECT $c hx AS hx0, hy AS hy0, " +
      s"CAST(0 AS BIGINT) AS hd0 FROM ($baseSql)"
    var i = 0
    for (s <- levels(bits)) {
      val (d, x, y) = levelSql(s, bits, s"hd$i", s"hx$i", s"hy$i")
      cur = s"SELECT $c ($d) AS hd${i + 1}, ($x) AS hx${i + 1}, " +
        s"($y) AS hy${i + 1} FROM ($cur)"
      i += 1
    }
    s"SELECT $c hd$i AS hd FROM ($cur)"
  }
}
