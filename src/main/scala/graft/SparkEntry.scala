package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered as a named
  * query; where the semantics are ANSI-SQL-expressible the matching DuckDB
  * oracle SQL is registered too (same column names, same ORDER BY).
  */
object SparkEntry {

  private def registries: Seq[Registry] = Seq(
    RelationalQueries, TextQueries, VectorQueries, EventQueries,
    PipelineQueries, EvalQueries, IngestQueries, SketchQueries)

  /** Gate-strength classes (VERDICT r13 item 5), kept in ONE table so the
    * classification can't drift per-file. Default (absent here) is
    * [[GateClass.IndependentOracle]]: the DuckDB oracle re-derives the
    * result from raw parquet with independently written SQL.
    *
    * ConstructionInverse = the query's media fixture is built by this
    * repo's own encoder and the green row certifies decode∘encode = id
    * (most also carry an external referee — ImageIO/AudioSystem cross-
    * check specs — and per-row error bounds inside the gated output).
    *
    * SharedSqlText = both engines execute the same SQL text (engine-
    * execution parity). EMPTY since r15 (q127's oracle was rewritten as
    * an independent DuckDB program; its in-JVM greedy re-derivation in
    * QueriesSpec stays as a third implementation). Note q300 was never
    * here: its packing is a Spark-side Scala fold vs a DuckDB recursive
    * CTE — two independent programs.
    */
  val gateClasses: Map[String, String] = {
    val ci = Seq(
      "q138_multimodal_decode", "q139_multimodal_resize",
      "q141_audio_features", "q156_png_roundtrip", "q157_jpeg_decode",
      "q158_gif_frames", "q159_y4m_frames", "q160_media_catalog",
      "q272_avi_mjpeg_frames", "q287_mpeg1_iframes", "q288_mpeg1_pframes",
      "q289_mpeg1_bframes", "q290_adpcm_audio", "q294_avro_ingest",
      "q299_png_adam7", "q301_tiff_ingest", "q302_mp2_audio",
      "q303_h264_intra", "q307_h264_i4x4", "q309_h264_pframes",
      "q310_mp2_stereo", "q311_mp3_layer3", "q312_h264_cavlc_full",
      "q313_h264_bframes", "q314_h264_cabac_intra", "q315_h265_intra",
      "q316_h264_cabac_inter", "q317_h264_cabac_bframes",
      "q318_h264_cabac_tdirect", "q319_h265_inter",
      "q320_h265_bframes")
      .map(_ -> GateClass.ConstructionInverse)
    // the shared-sql-text class is EMPTY since r15: q127's oracle is now
    // an independently-formulated DuckDB program (set-wise longest-prefix
    // steps + a join-walk recursion vs Spark's correlated-MAX recursive
    // CTE); the mechanism stays for honest labeling of any future gate
    val st = Seq.empty[String].map(_ -> GateClass.SharedSqlText)
    (ci ++ st).toMap
  }

  private lazy val all: Seq[Q] = {
    val es = registries.flatMap(_.entries)
      .map(q => gateClasses.get(q.name).fold(q)(g => q.copy(gate = g)))
    require(es.map(_.name).distinct.size == es.size, "duplicate query names")
    val unknown = gateClasses.keySet -- es.map(_.name).toSet
    require(unknown.isEmpty, s"gateClasses names unknown queries: $unknown")
    es
  }

  /** name → gate class for every registered query (see [[gateClasses]]). */
  def allGateClasses: Map[String, String] = all.map(q => q.name -> q.gate).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Queries that drive an actual StreamingQuery — Bench reports their
    * times under a separate total (micro-batch harness setup dominates
    * their wall-clock; see Q.streaming).
    */
  def streamingQueries: Set[String] = all.filter(_.streaming).map(_.name).toSet
}
