package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{EntityReaders, Readers, Tables}
import graft.mapping.{SchemaXml, SqlGuard}

/** Ingest readers (SURVEY §2.A2/A5/A6/A8) as driver-gated queries.
  *
  * Each query derives a small fixture file DETERMINISTICALLY from the
  * benchmark tables, writes it to a fixed path, runs the production reader
  * over it, and returns the normalized relation. The DuckDB oracle reads
  * the very same file (read_csv/read_json) — so the parse + reconcile +
  * normalize pipeline is value-checked end-to-end, not just spec'd
  * (VERDICT r2: A-family was spec-only). Fixture rows are metadata-scale
  * (dimension tables); the READER itself is a plain distributed
  * spark.read, so the same code path scales to real inputs.
  *
  * Fixture contract: every fixture's CONTENT must be scale-factor
  * invariant (nation/region are fixed-size; the first 10 suppliers are
  * identical at every SF — verified against all three test dirs). The
  * fixed /tmp path is then idempotent: a Bench or Verify run at a
  * different SF between this query's dump and the driver's oracle replay
  * rewrites identical bytes instead of corrupting the comparison.
  */
object IngestQueries extends Registry {

  private val fixDir = "/tmp/graft_fixtures"

  /** Per-JVM token for fixture paths that are WRITTEN as a side effect of
    * building a DataFrame (q92/q125): two concurrent processes at the SAME
    * scale factor would otherwise race one mode(overwrite) directory, and
    * a reader in one could observe the other's half-replaced files. Text
    * fixtures (q60/q61/…) stay on fixed paths — their bytes are
    * SF-invariant and single-file writes are atomic enough for re-reads.
    */
  private val jvmTok: String = {
    pruneStaleFixtures()
    ProcessHandle.current().pid().toString
  }

  /** Pid-keyed fixture dirs/files (q92/q125/q134/q135/q162/q181) are never
    * dropped by their OWNING process — the catalog entries must outlive the
    * lazy plans that resolve through them — so on-disk residency would grow
    * without bound across processes. Startup therefore sweeps /tmp/
    * graft_fixtures for entries whose trailing `_<pid>` token no longer maps
    * to a live process and deletes them; the live-process check makes the
    * sweep safe under concurrent Verify/Bench runs at any scale factor.
    */
  private def pruneStaleFixtures(): Unit = {
    val dir = Paths.get(fixDir)
    if (Files.isDirectory(dir)) {
      val pidPat = ".*_(\\d+)(?:\\.\\w+)?$".r
      val self = ProcessHandle.current().pid()
      val it = Files.list(dir).iterator()
      while (it.hasNext) {
        val p = it.next()
        p.getFileName.toString match {
          case pidPat(pid) if pid.toLong != self &&
              !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) =>
            try deleteRecursively(p) catch { case _: java.io.IOException => () }
          case _ => ()
        }
      }
    }
  }

  /** Shared recursive delete (also used by PipelineQueries.publishParquet)
    * — one definition, in [[graft.core.Fs]].
    */
  private[queries] def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.core.Fs.deleteRecursively(p)

  /** Atomic text-fixture write: content lands in a pid-keyed temp file
    * first and is renamed over the fixed path in one ATOMIC_MOVE, so a
    * crashed process can never leave a half-written fixture for a
    * concurrent reader (the fixed path either holds the previous complete
    * bytes or the new complete bytes). Stale temp files carry a trailing
    * `_<pid>` token and are swept by pruneStaleFixtures.
    */
  private def write(name: String, content: String): String = {
    Files.createDirectories(Paths.get(fixDir))
    val p = Paths.get(fixDir, name)
    val tmp = Paths.get(fixDir, s"$name.tmp_$jvmTok")
    Files.writeString(tmp, content)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    p.toString
  }

  override def entries: Seq[Q] = Seq(

    // ---- A2: all-string CSV scan + declared-schema reconciliation --------
    //      (lowercased headers, rename map, missing declared column added
    //      as NULL, extra column dropped by the declared projection;
    //      ref: prompt/InstanceDataHandler.py:104-410)
    Q("q60_csv_reconcile",
      (s, dir) => {
        import s.implicits._
        val rows = Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long"), $"n_name")
          .orderBy($"n_nationkey").collect()
          .map(r => s"${r.getLong(0)},${r.getString(1)},x${r.getLong(0)}")
        val path = write("nations.csv",
          ("N_NATIONKEY,N_NAME,EXTRA" +: rows).mkString("\n"))
        Readers.csvAllString(s, path,
            declaredCols = Seq("nation_key", "n_name", "n_comment"),
            renames = Map("n_nationkey" -> "nation_key"))
          .orderBy($"nation_key")
      },
      Some(s"""SELECT CAST(N_NATIONKEY AS VARCHAR) AS nation_key,
          N_NAME AS n_name, CAST(NULL AS VARCHAR) AS n_comment
        FROM read_csv('$fixDir/nations.csv', header=true, all_varchar=true)
        ORDER BY nation_key""")),

    // ---- A6: JSONL ingest with duplicate-line dedup + NULL-token
    //      normalization ('', 'null', '\n' -> NULL; ref: DataLoader.py:140-209)
    Q("q61_jsonl_normalize",
      (s, dir) => {
        import s.implicits._
        // top-10 ONLY: the first 10 suppliers are identical at every scale
        // factor (verified), so the fixture bytes are SF-invariant and a
        // Bench run at another SF between Verify and the oracle replay
        // rewrites the same content instead of corrupting the gate
        val sups = Tables(s, dir, "supplier")
          .select($"s_suppkey".cast("long"), $"s_name")
          .orderBy($"s_suppkey").limit(10).collect()
        val lines = sups.flatMap { r =>
          val k = r.getLong(0)
          val note = if (k % 3 == 0) "null" else s"ok$k"
          val line = s"""{"k": "$k", "name": "${r.getString(1)}", "note": "$note"}"""
          // duplicate every 5th line — the reader must drop the copy
          if (k % 5 == 0) Seq(line, line) else Seq(line)
        }
        val path = write("sups.jsonl", lines.mkString("\n"))
        Readers.jsonlNormalized(s, path,
            Readers.allStringSchema(Seq("k", "name", "note")))
          .orderBy($"k")
      },
      Some(s"""SELECT k, name,
          CASE WHEN lower(trim(note)) IN ('', 'null', '\\n') THEN NULL
               ELSE note END AS note
        FROM (SELECT DISTINCT k, name, note
              FROM read_json('$fixDir/sups.jsonl', format='newline_delimited',
                columns={k: 'VARCHAR', name: 'VARCHAR', note: 'VARCHAR'}))
        ORDER BY k""")),

    // ---- A5: BibTeX ingest -> (publications, authors, pub_authors) -------
    //      the bib text is GENERATED from supplier, so the oracle can
    //      recompute the expected post-parse relations straight from the
    //      table — if parsing, author explode, initcap normalization or
    //      dense surrogate ids drift, the hashes diverge
    //      (ref: DataLoader.py:288-350 bibtex entity split)
    Q("q62_bibtex_relations",
      (s, dir) => {
        import s.implicits._
        val sups = Tables(s, dir, "supplier")
          .select($"s_suppkey".cast("long"), $"s_name")
          .orderBy($"s_suppkey").limit(10).collect()
        val bib = sups.map { r =>
          val k = r.getLong(0)
          s"""@article{p$k,
             |  author = {${r.getString(1)} and Shared Author},
             |  title = {Title $k},
             |  year = {2020},
             |}""".stripMargin
        }.mkString("\n\n")
        val t = EntityReaders.bibTables(s, EntityReaders.parseBib(bib))
        t.pubAuthors
          .join(t.authors, "author_id")
          .join(t.publications, "pub_id")
          .select($"pub_id", $"cite_key", $"title", $"year",
            $"author_id", $"author_name")
          .orderBy($"pub_id", $"author_id")
      },
      Some("""WITH s AS (SELECT s_suppkey, s_name FROM supplier
          ORDER BY s_suppkey LIMIT 10),
        pubs AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS BIGINT) AS pub_id,
            'p' || CAST(s_suppkey AS VARCHAR) AS cite_key,
            'Title ' || CAST(s_suppkey AS VARCHAR) AS title,
            '2020' AS year,
            upper(substr(s_name, 1, 1)) || lower(substr(s_name, 2)) AS a1
          FROM s),
        ra AS (SELECT pub_id, a1 AS author_name FROM pubs
               UNION ALL SELECT pub_id, 'Shared Author' FROM pubs),
        auth AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY author_name) AS BIGINT) AS author_id,
            author_name
          FROM (SELECT DISTINCT author_name FROM ra))
        SELECT p.pub_id, p.cite_key, p.title, p.year, a.author_id, a.author_name
        FROM ra JOIN auth a USING (author_name) JOIN pubs p USING (pub_id)
        ORDER BY pub_id, author_id""")),

    // ---- A7: DBLP-style publication JSON: type dispatch with 'article'
    //      default, authors array, first-of-list rule for multi-valued ee
    //      (ref: DataLoader.py:471-559) ------------------------------------
    Q("q64_dblp_relations",
      (s, dir) => {
        import s.implicits._
        val sups = Tables(s, dir, "supplier")
          .select($"s_suppkey".cast("long"), $"s_name")
          .orderBy($"s_suppkey").limit(10).collect()
        val lines = sups.map { r =>
          val k = r.getLong(0)
          val t = if (k % 2 == 0) """"type": "book", """ else ""
          s"""{$t"title": "T$k", "year": 2020, "ee": ["http://a/$k", "http://b/$k"], """ +
            s""""authors": ["${r.getString(1)}", "Shared Author"]}"""
        }
        val path = write("dblp.jsonl", lines.mkString("\n"))
        val t = EntityReaders.dblpTables(s, path)
        t.pubAuthors
          .join(t.authors, "author_id")
          .join(t.publications, "pub_id")
          .select($"entry_type", $"title", $"year", $"ee",
            $"author_id", $"author_name")
          .orderBy($"title", $"author_id")
      },
      Some("""WITH s AS (SELECT s_suppkey, s_name FROM supplier
          ORDER BY s_suppkey LIMIT 10),
        pubs AS (SELECT
            CASE WHEN s_suppkey % 2 = 0 THEN 'book' ELSE 'article' END AS entry_type,
            'T' || CAST(s_suppkey AS VARCHAR) AS title,
            '2020' AS year,
            'http://a/' || CAST(s_suppkey AS VARCHAR) AS ee,
            s_name FROM s),
        ra AS (SELECT entry_type, title, year, ee, s_name AS author_name FROM pubs
               UNION ALL
               SELECT entry_type, title, year, ee, 'Shared Author' FROM pubs),
        auth AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY author_name) AS BIGINT) AS author_id,
            author_name
          FROM (SELECT DISTINCT author_name FROM ra))
        SELECT entry_type, title, year, ee, author_id, author_name
        FROM ra JOIN auth USING (author_name)
        ORDER BY title, author_id""")),

    // ---- A3 + A9: XML schema scan -> typed attributes + generated DDL ----
    //      the XML is generated from nation (one relation per region,
    //      attributes = that region's nations), parsed by the production
    //      loader, and re-derived by the oracle from the same rows — type
    //      supertyping, nullability, pk membership and the exact DDL string
    //      are all hash-checked (ref: SchemaLoader.py:49-157, Schema.py:106-134)
    Q("q65_xml_schema_ddl",
      (s, dir) => {
        import s.implicits._
        val nats = Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long"), lower($"n_name").as("nm"),
            $"n_regionkey".cast("long"))
          .orderBy($"n_nationkey").collect()
        val rels = nats.groupBy(_.getLong(2)).toSeq.sortBy(_._1).map { case (rk, rows) =>
          val sorted = rows.sortBy(_.getLong(0))
          val attrs = sorted.map { r =>
            val k = r.getLong(0)
            val ty = if (k % 2 == 0) "int" else "text"
            s"""    <attribute name="${r.getString(1)}" type="$ty" nullable="${k % 3 != 0}" description="nation $k"/>"""
          }.mkString("\n")
          val pk = sorted.head.getString(1)
          s"""  <relation name="r_$rk">\n$attrs\n    <primaryKey><attr>$pk</attr></primaryKey>\n  </relation>"""
        }
        val xml = s"<schema>\n${rels.mkString("\n")}\n</schema>"
        val schema = graft.mapping.SchemaXml.parseSchema(xml)
        val rows = schema.relations.flatMap { rel =>
          val ddl = rel.ddl("src")
          rel.attributes.map(a => (rel.name, a.name,
            graft.core.Model.superType(a.dataType), a.nullable,
            rel.primaryKey.contains(a.name), ddl))
        }
        s.createDataset(rows)
          .toDF("relation", "attr_name", "super_type", "nullable", "is_pk", "ddl")
          .orderBy($"relation", $"attr_name")
      },
      Some("""WITH n AS (SELECT n_nationkey AS k, lower(n_name) AS nm,
            n_regionkey AS rk FROM nation),
        a AS (SELECT 'r_' || CAST(rk AS VARCHAR) AS relation, nm AS attr_name,
            CASE WHEN k % 2 = 0 THEN 'INTEGER' ELSE 'TEXT' END AS super_type,
            k % 3 <> 0 AS nullable,
            k = min(k) OVER (PARTITION BY rk) AS is_pk,
            k FROM n),
        d AS (SELECT relation, string_agg('`' || attr_name || '` ' ||
                CASE super_type WHEN 'INTEGER' THEN 'BIGINT' ELSE 'STRING' END ||
                CASE WHEN nullable THEN '' ELSE ' NOT NULL' END, ', ' ORDER BY k) AS cols
              FROM a GROUP BY relation)
        SELECT a.relation, attr_name, super_type, nullable, is_pk,
          'CREATE TABLE IF NOT EXISTS `src`.`' || a.relation || '` (' || d.cols
            || ') USING PARQUET' AS ddl
        FROM a JOIN d ON a.relation = d.relation
        ORDER BY a.relation, attr_name""")),

    // ---- A4: gold-mapping XML scan -> flattened mapping clusters ---------
    //      (ref: MappingLoader.py:31-65)
    Q("q66_xml_mappings",
      (s, dir) => {
        import s.implicits._
        val nats = Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long"), lower($"n_name").as("nm"),
            $"n_regionkey".cast("long"))
          .orderBy($"n_nationkey").collect()
        val maps = nats.groupBy(_.getLong(2)).toSeq.sortBy(_._1).map { case (rk, rows) =>
          val srcs = rows.sortBy(_.getLong(0))
            .map(r => s"    <sourceRelation>${r.getString(1)}</sourceRelation>").mkString("\n")
          s"""  <mapping id="m$rk">\n$srcs\n    <targetRelation>t_$rk</targetRelation>\n    <goldSql>SELECT $rk</goldSql>\n  </mapping>"""
        }
        val xml = s"<mappings>\n${maps.mkString("\n")}\n</mappings>"
        val clusters = graft.mapping.SchemaXml.parseMappings(xml)
        val rows = clusters.flatMap { c =>
          c.sourceRelations.map(r => (c.id, "src", r)) ++
            c.targetRelations.map(r => (c.id, "tgt", r)) ++
            c.goldSql.map(g => (c.id, "sql", g))
        }
        s.createDataset(rows).toDF("mapping_id", "kind", "value")
          .orderBy($"mapping_id", $"kind", $"value")
      },
      Some("""WITH n AS (SELECT n_nationkey AS k, lower(n_name) AS nm,
            CAST(n_regionkey AS VARCHAR) AS rk FROM nation)
        SELECT 'm' || rk AS mapping_id, 'src' AS kind, nm AS value FROM n
        UNION ALL
        SELECT DISTINCT 'm' || rk, 'tgt', 't_' || rk FROM n
        UNION ALL
        SELECT DISTINCT 'm' || rk, 'sql', 'SELECT ' || rk FROM n
        ORDER BY mapping_id, kind, value""")),

    // ---- B6 + F10: statement triage + namespace qualification ------------
    //      four statement shapes generated per nation row (SELECT / DROP /
    //      prose / INSERT with the table name inside a string literal); the
    //      oracle reconstructs the expected post-guard strings, so triage
    //      misclassification, a missed qualification, or a literal rewrite
    //      all diverge the hash (ref: Evaluator.py:59-119)
    Q("q67_sql_guard",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long")).as[Long]
          .flatMap { k =>
            val stmt = (k % 4) match {
              case 0 => s"SELECT $k FROM nations_tbl"
              case 1 => s"DROP TABLE nations_tbl"
              case 2 => s"Sure, here is the SQL for $k:"
              case _ => s"INSERT INTO tgt_tbl SELECT $k FROM nations_tbl " +
                "WHERE note <> 'keep nations_tbl'"
            }
            SqlGuard.triage(Seq(stmt))
              .map(t => (k, SqlGuard.qualify(t, Set("nations_tbl"), Set("tgt_tbl"))))
          }
          .toDF("n_nationkey", "stmt")
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_nationkey % 4 = 0
               THEN 'SELECT ' || CAST(n_nationkey AS VARCHAR) || ' FROM source.nations_tbl'
               ELSE 'INSERT INTO target.tgt_tbl SELECT ' || CAST(n_nationkey AS VARCHAR)
                 || ' FROM source.nations_tbl WHERE note <> ''keep nations_tbl'''
          END AS stmt
        FROM nation WHERE n_nationkey % 4 IN (0, 3)
        ORDER BY n_nationkey""")),

    // ---- B7 + H4: meaningful-attribute tuple overlap through the
    //      production evaluator (surrogate/non-meaningful columns excluded
    //      before the EXCEPT/INTERSECT; ref: Evaluator.py:194-203) ---------
    Q("q68_meaningful_overlap",
      (s, dir) => {
        import s.implicits._
        val o = Tables(s, dir, "orders")
        val rel = graft.core.Model.Relation("orders_cust", Seq(
          graft.core.Model.Attribute("o_custkey", "int"),
          // non-meaningful: must NOT affect the overlap counts
          graft.core.Model.Attribute("o_orderpriority", "text", meaningful = false)))
        val pred = o.filter(year($"o_orderdate") === 1995)
          .select($"o_custkey", $"o_orderpriority")
        val gold = o.filter(year($"o_orderdate") === 1996)
          .select($"o_custkey", $"o_orderpriority")
        val ov = graft.mapping.OverlapEvaluator.tableOverlap(pred, gold, rel)
        s.range(1).select(
          lit(ov.relation).as("relation"),
          lit(ov.tp).as("tp"), lit(ov.fp).as("fp"), lit(ov.fn).as("fn"),
          lit(ov.precision).as("precision"), lit(ov.recall).as("recall"),
          lit(ov.f1).as("f1"))
      },
      Some("""WITH p AS (SELECT DISTINCT o_custkey FROM orders
            WHERE extract(year FROM o_orderdate) = 1995),
          g AS (SELECT DISTINCT o_custkey FROM orders
            WHERE extract(year FROM o_orderdate) = 1996),
          c AS (SELECT
            CAST((SELECT count(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM g)) AS BIGINT) AS tp,
            CAST((SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM g)) AS BIGINT) AS fp,
            CAST((SELECT count(*) FROM (SELECT * FROM g EXCEPT SELECT * FROM p)) AS BIGINT) AS fn)
        SELECT 'orders_cust' AS relation, tp, fp, fn,
          CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
          CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
          CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                  + (CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END) = 0
               THEN 0.0
               ELSE 2 * (CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                      * (CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END)
                    / ((CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                     + (CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END))
          END AS f1
        FROM c""")),

    // ---- A10: catalog namespace registration + cached read-back ----------
    //      region is imported into the `source` database via the production
    //      registerTable (saveAsTable), read back through the catalog,
    //      cached, aggregated; the oracle aggregates the parquet directly —
    //      a corrupted import or a stale cache diverges the counts
    Q("q69_catalog_roundtrip",
      (s, dir) => {
        import s.implicits._
        graft.mapping.OverlapEvaluator.createNamespaces(s, Seq("source"))
        val rel = graft.core.Model.Relation("graft_q69_region", Seq(
          graft.core.Model.Attribute("r_regionkey", "int"),
          graft.core.Model.Attribute("r_name", "text")))
        graft.mapping.OverlapEvaluator.registerTable(s, "source", rel,
          Tables(s, dir, "region").select($"r_regionkey", $"r_name"))
        val back = s.table("source.graft_q69_region").cache()
        back.groupBy($"r_regionkey")
          .agg(count(lit(1)).as("n"), min($"r_name").as("r_name"))
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey, CAST(count(*) AS BIGINT) AS n, min(r_name) AS r_name
        FROM region GROUP BY r_regionkey ORDER BY r_regionkey""")),

    // ---- A12: csv report sink round-trip ---------------------------------
    //      the per-segment report is written through the production csv
    //      sink, then BOTH engines read the same files back — the oracle
    //      checks the sink's bytes, not just the pre-sink frame
    Q("q70_report_sink",
      (s, dir) => {
        import s.implicits._
        // nation is fixed-size at every scale factor, so the sink bytes are
        // SF-invariant (same rationale as the q61 fixture)
        val report = Tables(s, dir, "nation")
          .groupBy($"n_regionkey").agg(count(lit(1)).as("n_nations"))
        graft.eval.Report.writeCsv(report.coalesce(1), s"$fixDir/q70_report")
        s.read.option("header", true).csv(s"$fixDir/q70_report")
          .select($"n_regionkey", $"n_nations")
          .orderBy($"n_regionkey")
      },
      Some(s"""SELECT n_regionkey, n_nations
        FROM read_csv('$fixDir/q70_report/*.csv', header=true, all_varchar=true)
        ORDER BY n_regionkey""")),

    // ---- ORC sink + source roundtrip: write a filtered/projected orders
    //      slice as ORC, read it back, aggregate. Exercises the second
    //      columnar format end-to-end (schema, timestamps, predicate
    //      pushdown on the re-read — ORC supports PushedFilters exactly
    //      like parquet). The oracle can't read ORC, so it recomputes the
    //      same aggregate from the parquet source — a lossless roundtrip
    //      is exactly what makes the two agree. The fixture dir is keyed
    //      by SF and by JVM so Verify (sf0.01), Bench (sf0.1) and any
    //      concurrent same-SF process never clobber each other's bytes
    //      mid-comparison. -------------------------------------------------
    Q("q92_orc_roundtrip",
      (s, dir) => {
        import s.implicits._
        val sfKey = dir.replaceAll("[^a-zA-Z0-9.]", "_")
        val orcPath = s"$fixDir/q92_orders_${sfKey}_$jvmTok.orc"
        Tables(s, dir, "orders")
          .filter($"o_orderstatus" =!= "F")
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice", $"o_orderdate")
          .write.mode("overwrite").orc(orcPath)
        s.read.orc(orcPath)
          .filter(year($"o_orderdate") >= 1993)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_orderstatus <> 'F' AND year(o_orderdate) >= 1993
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Hive-partitioned parquet layout: write documents partitioned by
    //      lang, read back ONE language — the filter becomes a PARTITION
    //      filter (directory pruning, `PartitionFilters` in the scan; pinned
    //      by PlanShapeSpec), so the read touches 1/5 of the files before a
    //      single row deserializes. At 100 TB this is the difference
    //      between scanning a corpus and listing a directory: partition by
    //      the columns every consumer filters on (lang / source / split).
    //      The oracle recomputes from the unpartitioned source — agreement
    //      proves the layout roundtrip is lossless. The fixture dir is
    //      keyed by SF and by JVM so Verify (sf0.01), Bench (sf0.1) and
    //      any concurrent same-SF process never clobber each other's
    //      bytes mid-comparison. --------------------------------------------
    Q("q125_partitioned_write",
      (s, dir) => {
        import s.implicits._
        val sfKey = dir.replaceAll("[^a-zA-Z0-9.]", "_")
        val p = s"$fixDir/q125_docs_${sfKey}_$jvmTok.parquet"
        Tables(s, dir, "documents")
          .select($"doc_id", $"source", $"n_chars", $"lang")
          .write.mode("overwrite").partitionBy("lang").parquet(p)
        s.read.parquet(p).filter($"lang" === "en")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars
          FROM documents WHERE lang = 'en'
          GROUP BY source ORDER BY source""")),

    // ---- semi-structured Variant path (Spark 4): rows serialize to JSON,
    //      parse_json builds the binary Variant, typed extraction happens
    //      with variant_get path expressions — the modern schema-on-read
    //      shape for ragged event payloads (vs a rigid from_json schema).
    //      All row-local until the final aggregate; the oracle inverts the
    //      construction (extraction of a field equals the source column),
    //      so a corrupted encode/decode path diverges the hash. ------------
    Q("q110_variant_json",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select(to_json(struct(
            $"o_orderkey".as("id"),
            struct($"o_orderstatus".as("status"), $"o_totalprice".as("total"))
              .as("state"))).as("payload"))
          .select(parse_json($"payload").as("v"))
          .select(
            expr("variant_get(v, '$.state.status', 'string')").as("status"),
            expr("variant_get(v, '$.id', 'long')").as("id"),
            expr("variant_get(v, '$.state.total', 'decimal(18,2)')").as("total"))
          .groupBy($"status")
          .agg(count(lit(1)).as("n_orders"),
            max($"id").as("max_id"),
            sum($"total").cast("double").as("revenue"))
          .orderBy($"status")
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n_orders,
          max(o_orderkey) AS max_id,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_orderstatus ORDER BY status""")),

    // ---- schema evolution roundtrip: v1 shards carry (doc_id, source),
    //      v2 shards add a column — exactly how a 100 TB corpus accretes
    //      fields over months of ingest. mergeSchema unions the footers at
    //      read time (old shards surface NULL for the new column; no
    //      rewrite of petabytes of v1 files), and the aggregate proves the
    //      merged read is lossless vs recomputing from the source table.
    //      The cut is integer arithmetic (q122's rule) so both engines
    //      split identically. Fixture dir keyed by SF and JVM (q92 note). --
    Q("q134_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val sfKey = dir.replaceAll("[^a-zA-Z0-9.]", "_")
        val p = s"$fixDir/q134_docs_${sfKey}_$jvmTok.parquet"
        val d = Tables(s, dir, "documents")
          .join(broadcast(Tables(s, dir, "documents")
            .agg(expr("max(doc_id) - max(doc_id) div 2").as("cut"))))
        d.filter($"doc_id" < $"cut").select($"doc_id", $"source")
          .write.mode("overwrite").parquet(s"$p/v=1")
        d.filter($"doc_id" >= $"cut").select($"doc_id", $"source", $"n_chars")
          .write.mode("overwrite").parquet(s"$p/v=2")
        s.read.option("mergeSchema", true).parquet(p)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            count($"n_chars").as("n_with_chars"),
            sum($"n_chars").cast("long").as("sum_chars"))
          .orderBy($"source")
      },
      Some("""WITH m AS (SELECT max(doc_id) - max(doc_id) // 2 AS cut FROM documents)
          SELECT source, count(*) AS n_docs,
            count(CASE WHEN doc_id >= cut THEN n_chars END) AS n_with_chars,
            CAST(sum(CASE WHEN doc_id >= cut THEN n_chars END) AS BIGINT) AS sum_chars
          FROM documents, m GROUP BY source ORDER BY source""")),

    // ---- dynamic partition pruning: the fact table is laid out
    //      partitioned by order year; the filter arrives through a DIM
    //      table (year → parity), so static pruning can't see it. Spark
    //      plants a dynamicpruning subquery on the fact scan: the dim side
    //      runs first and only matching year directories are listed — at
    //      100 TB this is the difference between scanning 7 years and 3,
    //      decided at runtime. Plan pinned in PlanShapeSpec. Fixture dir
    //      keyed by SF and JVM (q92 note). --------------------------------
    Q("q135_dynamic_partition_pruning",
      (s, dir) => {
        import s.implicits._
        val sfKey = dir.replaceAll("[^a-zA-Z0-9.]", "_")
        val p = s"$fixDir/q135_orders_${sfKey}_$jvmTok.parquet"
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice",
            year($"o_orderdate").as("o_year"))
          .write.mode("overwrite").partitionBy("o_year").parquet(p)
        val dim = Tables(s, dir, "orders")
          .select(year($"o_orderdate").as("o_year")).distinct()
          .select($"o_year", ($"o_year" % 2).as("parity"))
        s.read.parquet(p)
          .join(dim.filter($"parity" === 0), Seq("o_year"))
          .groupBy($"o_year")
          .agg(count(lit(1)).as("n_orders"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
          .orderBy($"o_year")
      },
      Some("""SELECT year(o_orderdate) AS o_year, count(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders WHERE year(o_orderdate) % 2 = 0
          GROUP BY o_year ORDER BY o_year""")),

    // ---- A1: schema-pair dataset JSON scan + seeded shuffle + swap -------
    //      (ref: utils/data_builder.py:16-43). The JSON fixture derives
    //      from nation — one case per region, source side in the NESTED
    //      dialect (is_pk "YES"/"NO", column_description), target side in
    //      the FLAT dialect (boolean is_pk, no description) — so one gated
    //      query exercises both accepted shapes. The md5-keyed shuffle
    //      (Readers.shuffleCase) and the gold-reversing swap are replayed
    //      by the oracle straight from nation: a drift in dialect parsing,
    //      shuffle keying or swap semantics diverges the hash. -------------
    Q("q129_dataset_shuffle_swap",
      (s, dir) => {
        import s.implicits._
        val nats = Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long"), lower($"n_name").as("nm"),
            $"n_regionkey".cast("long"))
          .orderBy($"n_nationkey").collect()
        val cases = nats.groupBy(_.getLong(2)).toSeq.sortBy(_._1).map { case (rk, rows) =>
          val sorted = rows.sortBy(_.getLong(0))
          val k0 = sorted.head.getLong(0)
          val srcCols = sorted.map { r =>
            val k = r.getLong(0)
            s"""{"name": "${r.getString(1)}", "type": "${if (k % 2 == 0) "int" else "text"}", """ +
              s""""column_description": "d$k", "is_pk": "${if (k == k0) "YES" else "NO"}"}"""
          }
          val tgtCols = sorted.map { r =>
            s"""{"name": "t_${r.getString(1)}", "type": "text", "is_pk": ${r.getLong(0) % 4 == 0}}"""
          }
          val gold = sorted.filter(_.getLong(0) % 3 == 0)
            .map(r => s"""["${r.getString(1)}", "t_${r.getString(1)}"]""")
          s"""{"id": "case$rk", "gold_mapping": [${gold.mkString(", ")}], """ +
            s""""source_schema": {"name": "src$rk", "description": "", "columns": [${srcCols.mkString(", ")}]}, """ +
            s""""target_schema": [${tgtCols.mkString(", ")}]}"""
        }
        val path = write("pairs.json", "[" + cases.mkString(",\n") + "]")
        val tcs = Readers.schemaPairJson(s, path)
          .map(Readers.shuffleCase(_, seed = 129)).map(Readers.swapCase)
        val rows = tcs.flatMap { tc =>
          tc.sourceSchema.zipWithIndex.map { case (c, i) =>
            (tc.id, "source", i.toLong, c.name, c.dataType, c.description,
              if (c.isPk) 1L else 0L) } ++
          tc.targetSchema.zipWithIndex.map { case (c, i) =>
            (tc.id, "target", i.toLong, c.name, c.dataType, c.description,
              if (c.isPk) 1L else 0L) } ++
          tc.goldMapping.zipWithIndex.map { case ((a, b), i) =>
            (tc.id, "gold", i.toLong, a, b, "", 0L) }
        }
        s.createDataset(rows)
          .toDF("case_id", "part", "pos", "name", "typ", "descr", "is_pk")
          .orderBy($"case_id", $"part", $"pos")
      },
      Some("""WITH n AS (SELECT n_nationkey AS k, lower(n_name) AS nm,
                     n_regionkey AS rk, 'case' || CAST(n_regionkey AS VARCHAR) AS cid
              FROM nation),
          k0 AS (SELECT rk, min(k) AS k0 FROM n GROUP BY rk),
          -- post-swap 'source' side = original targets, shuffled by the 't' key
          srows AS (SELECT cid AS case_id, 'source' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cid
                   ORDER BY md5(concat_ws('|', '129', cid, 't', 't_' || nm))) - 1
                   AS BIGINT) AS pos,
                 't_' || nm AS name, 'text' AS typ, '' AS descr,
                 CAST(CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_pk
               FROM n),
          -- post-swap 'target' side = original sources, shuffled by the 's' key
          trows AS (SELECT cid AS case_id, 'target' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cid
                   ORDER BY md5(concat_ws('|', '129', cid, 's', nm))) - 1
                   AS BIGINT) AS pos,
                 nm AS name,
                 CASE WHEN k % 2 = 0 THEN 'int' ELSE 'text' END AS typ,
                 'd' || CAST(k AS VARCHAR) AS descr,
                 CAST(CASE WHEN k = k0 THEN 1 ELSE 0 END AS BIGINT) AS is_pk
               FROM n JOIN k0 USING (rk)),
          grows AS (SELECT cid AS case_id, 'gold' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cid ORDER BY k) - 1
                   AS BIGINT) AS pos,
                 't_' || nm AS name, nm AS typ, '' AS descr, CAST(0 AS BIGINT) AS is_pk
               FROM n WHERE k % 3 = 0)
          SELECT * FROM (SELECT * FROM srows UNION ALL SELECT * FROM trows
                         UNION ALL SELECT * FROM grows)
          ORDER BY case_id, part, pos""")),

    // ---- A8: CSV typed by the FIRST data row (int-looking first value →
    //      BIGINT, anything else stays VARCHAR — including a column whose
    //      first value is empty but later values are numeric) plus
    //      all-empty-row dropping (ref: DataLoader.py:89-132). The oracle
    //      reads the same file all-varchar and applies the casts the first
    //      row implies. ---------------------------------------------------
    Q("q130_csv_first_row_types",
      (s, dir) => {
        import s.implicits._
        val sups = Tables(s, dir, "supplier")
          .select($"s_suppkey".cast("long"), $"s_name")
          .orderBy($"s_suppkey").limit(10).collect()
        val firstK = sups.head.getLong(0)
        val lines = sups.flatMap { r =>
          val k = r.getLong(0)
          // mix: first row empty → the column must STAY varchar
          val mix = if (k == firstK) "" else k.toString
          val row = s"$k,${r.getString(1)},$mix"
          // inject an all-empty line after every 4th supplier — must drop
          if (k % 4 == 0) Seq(row, ",,") else Seq(row)
        }
        val path = write("typed.csv", ("k,name,mix" +: lines).mkString("\n"))
        EntityReaders.csvTypedByFirstRow(s, path).orderBy($"k")
      },
      Some(s"""SELECT CAST(k AS BIGINT) AS k, name, mix
          FROM read_csv('$fixDir/typed.csv', header=true, all_varchar=true)
          WHERE concat_ws('', COALESCE(k, ''), COALESCE(name, ''),
            COALESCE(mix, '')) <> ''
          ORDER BY k""")),

    // ---- F11: multimap cluster builder — subsumption removal (a cluster
    //      whose source AND target relation sets are contained in a larger
    //      cluster's is dropped), md5-seeded shuffle, grouping into pairs
    //      with merged relation lists (ref: MappingLoader.py:66-111). One
    //      cluster per region plus a deliberately subsumed 'm9' (strict
    //      subset of m0) that the filter must drop; the oracle rebuilds the
    //      kept clusters from region and replays the md5 order, so a drift
    //      in subsumption, shuffle keying, grouping or merge order
    //      diverges the hash. ---------------------------------------------
    Q("q131_cluster_grouping",
      (s, dir) => {
        import s.implicits._
        val regs = Tables(s, dir, "region")
          .select($"r_regionkey".cast("long"), lower($"r_name").as("nm"))
          .orderBy($"r_regionkey").collect()
        val nm0 = regs.head.getString(1)
        val clusters = regs.map { r =>
          val k = r.getLong(0); val nm = r.getString(1)
          SchemaXml.MappingCluster(s"m$k",
            sourceRelations =
              if (k == 0) Seq(s"s_$nm", "s_extra") else Seq(s"s_$nm"),
            targetRelations = Seq(s"t_$nm"),
            goldSql = Seq(s"INSERT $k"),
            joinOverlapSql = Seq.empty)
        }.toSeq :+ SchemaXml.MappingCluster("m9",
          Seq(s"s_$nm0"), Seq(s"t_$nm0"), Seq("INSERT 9"), Seq.empty)
        val grouped = SchemaXml.groupClusters(clusters, groupSize = 2, seed = 131)
        val rows = grouped.flatMap { g =>
          g.sourceRelations.zipWithIndex.map { case (rel, i) =>
            (g.id, "src", i.toLong, rel) } ++
          g.targetRelations.zipWithIndex.map { case (rel, i) =>
            (g.id, "tgt", i.toLong, rel) } ++
          g.goldSql.zipWithIndex.map { case (q, i) => (g.id, "sql", i.toLong, q) }
        }
        s.createDataset(rows).toDF("group_id", "part", "pos", "value")
          .orderBy($"group_id", $"part", $"pos")
      },
      Some("""WITH r AS (SELECT r_regionkey AS k, lower(r_name) AS nm FROM region),
          -- kept = one cluster per region ('m9' is subsumed by m0: both its
          -- relation sets are subsets and m0's source set is bigger)
          ord AS (SELECT k, nm, 'm' || CAST(k AS VARCHAR) AS id,
                 CAST(ROW_NUMBER() OVER (ORDER BY
                   md5(concat_ws('|', '131', 'm' || CAST(k AS VARCHAR)))) - 1
                   AS BIGINT) AS rn
               FROM r),
          g AS (SELECT *, 'group-' || CAST(rn // 2 AS VARCHAR) AS group_id FROM ord),
          srcel AS (SELECT group_id, rn, 0 AS ei, 's_' || nm AS value FROM g
                    UNION ALL SELECT group_id, rn, 1, 's_extra' FROM g WHERE k = 0),
          srows AS (SELECT group_id, 'src' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY rn, ei) - 1
                   AS BIGINT) AS pos, value
               FROM srcel),
          trows AS (SELECT group_id, 'tgt' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY rn) - 1
                   AS BIGINT) AS pos, 't_' || nm AS value
               FROM g),
          qrows AS (SELECT group_id, 'sql' AS part,
                 CAST(ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY rn) - 1
                   AS BIGINT) AS pos, 'INSERT ' || CAST(k AS VARCHAR) AS value
               FROM g)
          SELECT * FROM (SELECT * FROM srows UNION ALL SELECT * FROM trows
                         UNION ALL SELECT * FROM qrows)
          ORDER BY group_id, part, pos""")),

    // ---- INCREMENTAL AGGREGATE MAINTENANCE (q150's sibling on the
    //      aggregate layer): the nightly pattern every 100 TB metric
    //      pipeline runs — a stored per-key aggregate snapshot absorbs a
    //      new batch via MERGE of partial aggregates (full-outer join +
    //      coalesced adds) instead of recomputing history. Sums and
    //      counts are associative, so state ⊕ batch-partials ≡ full
    //      recompute — and the gate PROVES it: the emitted n_after /
    //      sum_after come from the incremental merge while the oracle
    //      recomputes them from all rows; any merge bug (dropped key,
    //      double count, null-eaten add) diverges the hash. Decimal-exact
    //      until the final double cast. Batch cost is O(delta) + a
    //      state-sized join — never O(history). ----------------------------
    Q("q277_incremental_agg",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
          .select($"l_returnflag", $"l_shipdate",
            $"l_quantity".cast("decimal(18,2)").as("qty"))
        val cutoff = "1995-01-01"
        val batchEnd = "1995-07-01"
        // the stored snapshot: per-key aggregate as of the cutoff
        val state = li.filter($"l_shipdate" < lit(cutoff))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_b"), sum($"qty").as("s_b"))
        // the new batch, folded to partial aggregates map-side
        val delta = li
          .filter($"l_shipdate" >= lit(cutoff) && $"l_shipdate" < lit(batchEnd))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_d"), sum($"qty").as("s_d"))
        state.join(delta, Seq("l_returnflag"), "full_outer")
          .select($"l_returnflag",
            coalesce($"n_b", lit(0L)).as("n_before"),
            coalesce($"n_d", lit(0L)).as("n_delta"),
            (coalesce($"n_b", lit(0L)) + coalesce($"n_d", lit(0L))).as("n_after"),
            (coalesce($"s_b", lit(0).cast("decimal(18,2)"))
              + coalesce($"s_d", lit(0).cast("decimal(18,2)")))
              .cast("double").as("sum_qty_after"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH st AS (SELECT l_returnflag, count(*) AS n_b,
              sum(CAST(l_quantity AS DECIMAL(18,2))) AS s_b
            FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1995-01-01'
            GROUP BY 1),
          d AS (SELECT l_returnflag, count(*) AS n_d,
              sum(CAST(l_quantity AS DECIMAL(18,2))) AS s_d
            FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1995-07-01'
            GROUP BY 1),
          -- the ORACLE takes the other road: one recompute over all rows
          -- up to the batch end — merge ≡ recompute is the gated claim
          full_r AS (SELECT l_returnflag, count(*) AS n_full,
              sum(CAST(l_quantity AS DECIMAL(18,2))) AS s_full
            FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1995-07-01'
            GROUP BY 1)
          SELECT f.l_returnflag,
            CAST(COALESCE(st.n_b, 0) AS BIGINT) AS n_before,
            CAST(COALESCE(d.n_d, 0) AS BIGINT) AS n_delta,
            CAST(f.n_full AS BIGINT) AS n_after,
            CAST(f.s_full AS DOUBLE) AS sum_qty_after
          FROM full_r f
          LEFT JOIN st ON st.l_returnflag = f.l_returnflag
          LEFT JOIN d ON d.l_returnflag = f.l_returnflag
          ORDER BY f.l_returnflag""")),

    // ---- INCREMENTAL JOIN-VIEW maintenance (q277/q282/q283's sibling on
    //      a JOIN, the classic delta rule): the materialized view
    //      V = Σ(orders ⋈ customer) per (segment, order month) absorbs an
    //      appended orders batch ΔO AND an appended customer batch ΔC as
    //      V ⊕ Σ(ΔO⋈C_old) ⊕ Σ(O_old⋈ΔC) ⊕ Σ(ΔO⋈ΔC) — the old×old join
    //      NEVER re-runs, which at 100 TB is the entire point: the two
    //      big sides meet only through their deltas (ΔC is broadcast; a
    //      production run would also semi-join-restrict O_old to ΔC's
    //      keys before the shuffle). Counts and decimal revenue merge by
    //      SUM (associative, exact); the ORACLE takes the other road —
    //      one full recompute of the join over everything visible at the
    //      batch end — so merge ≡ recompute is the gated claim on a
    //      binary operator, not just a group-by. Batches are derived
    //      from the benchmark tables (orders by date window, "new"
    //      customers by key residue), so both engines see identical
    //      splits. ----------------------------------------------------------
    Q("q293_incremental_join",
      (s, dir) => {
        import s.implicits._
        val cutoff = "1996-01-01"
        val batchEnd = "1996-07-01"
        val o = Tables(s, dir, "orders").select($"o_custkey",
          $"o_orderdate", $"o_totalprice".cast("decimal(18,2)").as("price"),
          (year($"o_orderdate") * 100 + month($"o_orderdate")).as("mon"))
        val c = Tables(s, dir, "customer")
          .select($"c_custkey", $"c_mktsegment")
        val oldO = o.filter($"o_orderdate" < lit(cutoff))
        val dO = o.filter(
          $"o_orderdate" >= lit(cutoff) && $"o_orderdate" < lit(batchEnd))
        val oldC = c.filter($"c_custkey" % 10 =!= 3)
        val dC = c.filter($"c_custkey" % 10 === 3) // the "new customers" batch
        def agg(orders: org.apache.spark.sql.DataFrame,
            cust: org.apache.spark.sql.DataFrame, bcastCust: Boolean) = {
          val dim = if (bcastCust) broadcast(cust) else cust
          orders.join(dim, $"o_custkey" === $"c_custkey")
            .groupBy($"c_mktsegment", $"mon")
            .agg(count(lit(1)).as("n"), sum($"price").as("rev"))
        }
        val vOld = agg(oldO, oldC, bcastCust = false) // the stored view
        val deltas = agg(dO, oldC, bcastCust = false)
          .unionByName(agg(oldO, dC, bcastCust = true))
          .unionByName(agg(dO, dC, bcastCust = true))
        vOld.unionByName(deltas)
          .groupBy($"c_mktsegment", $"mon")
          .agg(sum($"n").as("n"), sum($"rev").as("rev"))
          .select($"c_mktsegment", $"mon".cast("long").as("mon"),
            $"n".cast("long").as("n_orders"),
            $"rev".cast("double").as("revenue"))
          .orderBy($"c_mktsegment", $"mon")
      },
      Some("""SELECT c_mktsegment,
            CAST(year(CAST(o_orderdate AS DATE)) * 100
              + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
            CAST(count(*) AS BIGINT) AS n_orders,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE CAST(o_orderdate AS DATE) < DATE '1996-07-01'
          GROUP BY 1, 2 ORDER BY c_mktsegment, mon""")),

    // ---- AVRO object-container ingest WITH schema evolution (r13 — a
    //      new real source format; spark-avro isn't on this classpath,
    //      so the container layer runs the public core Avro API
    //      directly: magic, schema+codec metadata, deflate blocks, sync
    //      markers — sources/AvroBytes). Files are built per group from
    //      the benchmark rows (generation-inverse) under TWO writer
    //      generations — even file-groups lack the `tier` field, odd
    //      ones carry it — and ALL decode under today's reader schema
    //      via normative READER-SCHEMA RESOLUTION (missing field fills
    //      from the default), which is the property a 100 TB lake
    //      actually needs from Avro. The gate: per-file record counts,
    //      exact double score sums (quarter-steps — order-independent),
    //      the codec name read back from container metadata, and
    //      tier_len_sum, which distinguishes resolved defaults ('std')
    //      from real V2 values row-by-row — a broken resolution or codec
    //      flips it. A row-order roundtrip require rides inside the
    //      group. flatMapGroups keeps every container executor-local. ------
    Q("q294_avro_ingest",
      (s, dir) => {
        import s.implicits._
        import graft.sources.AvroBytes
        Tables(s, dir, "documents")
          .select($"doc_id", $"source")
          .as[(Long, String)]
          .groupByKey { case (id, _) => id % 8 }
          .flatMapGroups { (fileId: Long, it: Iterator[(Long, String)]) =>
            val rows = it.toSeq.sortBy(_._1)
            val v2 = fileId % 2 == 1
            val schema = if (v2) AvroBytes.WriterV2 else AvroBytes.WriterV1
            val recs = rows.map { case (id, src) =>
              (id, src, (id % 1000).toDouble / 4.0,
                if (v2) Some(src) else None)
            }
            val bytes = AvroBytes.encode(schema, recs)
            val (codec, decoded) = AvroBytes.decode(bytes)
            require(decoded.map(d => (d._1, d._2)) == rows,
              s"avro roundtrip drifted for file-group $fileId")
            Iterator.single((fileId, rows.size.toLong,
              decoded.map(_._3).sum,
              decoded.map(_._4.length.toLong).sum, codec))
          }
          .toDF("file_id", "n_records", "sum_score", "tier_len_sum", "codec")
          .orderBy($"file_id")
      },
      Some("""SELECT doc_id % 8 AS file_id,
            CAST(count(*) AS BIGINT) AS n_records,
            sum(CAST(doc_id % 1000 AS DOUBLE) / 4.0) AS sum_score,
            CAST(sum(length(CASE WHEN (doc_id % 8) % 2 = 1
                 THEN source ELSE 'std' END)) AS BIGINT) AS tier_len_sum,
            'deflate' AS codec
          FROM documents GROUP BY 1 ORDER BY file_id""")),

    // ---- CDC upsert compaction (MERGE without a table format): base
    //      snapshot + a change batch (upserts carry a higher version,
    //      deletes the highest) collapse to latest-state via ONE key
    //      shuffle — max(struct(version, ...)) is associative, so the
    //      argmax runs map-side-partial like any aggregate, no window sort
    //      over the corpus. Deletes survive the argmax and drop in a
    //      row-local filter. At 100 TB: bucket base and changes by key and
    //      the compaction becomes shuffle-free; this is the periodic
    //      rewrite every parquet-lake CDC pipeline runs. The change batch
    //      is derived from the base table so the oracle recomputes it. -----
    Q("q150_cdc_upsert",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents")
        val base = d.select($"doc_id", $"source", $"n_chars",
          lit(0L).as("version"), lit("upsert").as("op"))
        val ups = d.filter($"doc_id" % 7 === 0)
          .select($"doc_id", $"source", ($"n_chars" + 1000L).as("n_chars"),
            lit(1L).as("version"), lit("upsert").as("op"))
        val dels = d.filter($"doc_id" % 13 === 0)
          .select($"doc_id", $"source", $"n_chars",
            lit(2L).as("version"), lit("delete").as("op"))
        base.unionAll(ups).unionAll(dels)
          .groupBy($"doc_id")
          .agg(max(struct($"version", $"op", $"n_chars", $"source")).as("last"))
          .filter($"last.op" =!= "delete")
          .select($"doc_id", $"last.source".as("source"),
            $"last.n_chars".as("n_chars"), $"last.version".as("version"))
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (SELECT doc_id, source, n_chars,
              CAST(0 AS BIGINT) AS version, 'upsert' AS op FROM documents),
          ups AS (SELECT doc_id, source, n_chars + 1000,
              CAST(1 AS BIGINT), 'upsert' FROM documents WHERE doc_id % 7 = 0),
          dels AS (SELECT doc_id, source, n_chars,
              CAST(2 AS BIGINT), 'delete' FROM documents WHERE doc_id % 13 = 0),
          allr AS (SELECT * FROM base UNION ALL SELECT * FROM ups
                   UNION ALL SELECT * FROM dels),
          last AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY version DESC) AS rn FROM allr)
          SELECT doc_id, source, n_chars, version
          FROM last WHERE rn = 1 AND op <> 'delete' ORDER BY doc_id""")),

    // ---- error-tolerant ingest: a crawl feed where every 5th record is
    //      malformed JSON, read in PERMISSIVE mode with a _corrupt_record
    //      column — bad rows are QUARANTINED (null fields + raw line
    //      preserved), good rows flow through, nothing aborts. The row
    //      verdict rule is derived from table columns, so the oracle
    //      recomputes the good/corrupt split and the salvaged aggregate
    //      without parsing anything. At 100 TB this is the difference
    //      between a nightly ingest that finishes with a quarantine ratio
    //      and one a single bad shard kills. ------------------------------
    Q("q162_corrupt_records",
      (s, dir) => {
        import s.implicits._
        val rows = Tables(s, dir, "nation")
          .select($"n_nationkey".cast("long"), $"n_name")
          .orderBy($"n_nationkey").collect()
        val lines = rows.map { r =>
          val (k, nm) = (r.getLong(0), r.getString(1))
          if (k % 5 == 2) s"""{"k": $k, "name": UNQUOTED$k"""
          else s"""{"k": $k, "name": "$nm"}"""
        }
        val path = write(s"corrupt_${jvmTok}.jsonl", lines.mkString("\n"))
        s.read
          .schema("k LONG, name STRING, _corrupt_record STRING")
          .json(path)
          .agg(
            count(when($"_corrupt_record".isNull, 1)).as("n_good"),
            count($"_corrupt_record").as("n_corrupt"),
            sum(when($"_corrupt_record".isNull, $"k")).as("k_sum_good"))
      },
      Some("""SELECT
          CAST(count(CASE WHEN n_nationkey % 5 <> 2 THEN 1 END) AS BIGINT) AS n_good,
          CAST(count(CASE WHEN n_nationkey % 5 = 2 THEN 1 END) AS BIGINT) AS n_corrupt,
          CAST(sum(CASE WHEN n_nationkey % 5 <> 2 THEN n_nationkey END) AS BIGINT)
            AS k_sum_good
        FROM nation""")),

    // ---- bucketed co-located join: the single biggest shuffle eliminator
    //      for repeated fact-fact joins at 100 TB. Both orders and lineitem
    //      are written ONCE bucketed (and sort-ordered) by the join key
    //      into 8 buckets; the subsequent merge join reads bucket i of each
    //      side on the same task — NO Exchange on either side (pinned by
    //      PlanShapeSpec: the only shuffle in the plan is the final small
    //      groupBy). The `merge` hint keeps the demonstration honest at
    //      test SF where AQE would otherwise broadcast the small side; on a
    //      real cluster both sides are fact-sized and SMJ is what the
    //      planner picks anyway. Bucket count is a layout knob (≈ cluster
    //      cores at production scale); co-bucketing pays for itself after
    //      the second join against the same key. Table names + paths are
    //      SF- and JVM-keyed (same concurrency contract as q92/q125). The
    //      oracle recomputes the join from the raw parquet — bucketing must
    //      be layout-only, never semantics. ------------------------------
    Q("q181_bucketed_join",
      (s, dir) => {
        import s.implicits._
        val key = dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" + jvmTok
        val (lt, ot) = (s"q181_lineitem_$key", s"q181_orders_$key")
        // r17: the bucket count IS the join's parallelism (each merge-join
        // task reads one bucket of each side) — derive it from the session
        // instead of the constant 8 the comment above already calls "≈
        // cluster cores at production scale" (probe: the 8-task SMJ stage
        // owned the warm time on 32 cores). Repartitioning by the join key
        // to the same width first gives one file per bucket and spreads the
        // write+sort, which otherwise ran as the scan's 3 splits. Bucketing
        // stays layout-only: the oracle recomputes from the raw parquet.
        val nb = math.max(8, s.sparkContext.defaultParallelism)
        Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
          .repartition(nb, $"l_orderkey")
          .write.mode("overwrite").format("parquet")
          .bucketBy(nb, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$fixDir/$lt").saveAsTable(lt)
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority")
          .repartition(nb, $"o_orderkey")
          .write.mode("overwrite").format("parquet")
          .bucketBy(nb, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$fixDir/$ot").saveAsTable(ot)
        // The two tables stay registered for the JVM's lifetime BY DESIGN:
        // bucketing metadata lives in the catalog entry, and the returned
        // (lazy) plan resolves through it at execution time — dropping
        // them here would orphan the bucket info before the driver runs
        // the query. Names are (sf, pid)-keyed, so residency is bounded at
        // 2 entries per scale factor per process.
        // exact integer units (cents × discount basis points): a
        // double→DECIMAL(18,2) cast of the price×(1−disc) product rounds
        // half-way cases differently across engines; integer arithmetic
        // is associative AND engine-exact (the repo-wide quantize contract)
        s.table(lt).hint("merge")
          .join(s.table(ot), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            (sum(round($"l_extendedprice" * 100).cast("long")
              * (lit(100L) - round($"l_discount" * 100).cast("long")))
              .cast("double") / 1e4).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
              / 10000.0 AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
