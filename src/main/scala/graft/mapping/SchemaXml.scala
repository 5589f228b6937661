package graft.mapping

import scala.util.Try
import scala.xml.{Node, XML}
import graft.core.Model._

/** Driver-side XML loaders for the schema-mapping pipeline
  * (SURVEY §2.A3/A4/F11; behavior of
  * `Schema Mapping/DatabaseUtils/SchemaLoader.py:49-157` and
  * `MappingLoader.py:31-111`). These parse metadata, not data — they run on
  * the driver and feed `StructType`s / catalog DDL; the distributed engine
  * never touches XML.
  *
  * Accepted shape (superset of both reference dialects):
  * {{{
  * <schema>
  *   <relation name="person">
  *     <attribute name="id" type="int" size="10" nullable="false" description="pk"/>
  *     <primaryKey><attr>id</attr></primaryKey>
  *     <unique><attr>name</attr></unique>
  *     <foreignKey relation="dept"><from>dept_id</from><to>id</to></foreignKey>
  *   </relation>
  * </schema>
  * }}}
  */
object SchemaXml {

  def parseSchema(xml: String, skipRelations: String => Boolean = _ => false): Schema = {
    val root = XML.loadString(xml)
    val rels = (root \ "relation")
      .filterNot(r => skipRelations(attr(r, "name")))
      .map(parseRelation)
    Schema(rels.toSeq)
  }

  private def parseRelation(r: Node): Relation = {
    val attrs = (r \ "attribute").map { a =>
      Attribute(
        name = attr(a, "name"),
        dataType = attrOpt(a, "type").getOrElse("text"),
        size = attrOpt(a, "size").flatMap(s => Try(s.toInt).toOption),
        nullable = attrOpt(a, "nullable").forall(_.toBoolean),
        meaningful = attrOpt(a, "meaningful").forall(_.toBoolean),
        description = attrOpt(a, "description").getOrElse(""))
    }
    Relation(
      name = attr(r, "name"),
      attributes = attrs.toSeq,
      primaryKey = (r \ "primaryKey" \ "attr").map(_.text.trim).toSeq,
      uniques = (r \ "unique").map(u => (u \ "attr").map(_.text.trim).toSeq).toSeq,
      foreignKeys = (r \ "foreignKey").map { fk =>
        ForeignKey((fk \ "from").map(_.text.trim).toSeq, attr(fk, "relation"),
          (fk \ "to").map(_.text.trim).toSeq)
      }.toSeq)
  }

  /** A4: gold-mapping clusters {id, source/target relations, gold SQL}. */
  final case class MappingCluster(
      id: String,
      sourceRelations: Seq[String],
      targetRelations: Seq[String],
      goldSql: Seq[String],
      joinOverlapSql: Seq[String])

  def parseMappings(xml: String): Seq[MappingCluster] = {
    val root = XML.loadString(xml)
    (root \ "mapping").map { m =>
      MappingCluster(
        id = attr(m, "id"),
        sourceRelations = (m \ "sourceRelation").map(_.text.trim).toSeq,
        targetRelations = (m \ "targetRelation").map(_.text.trim).toSeq,
        goldSql = (m \ "goldSql").map(_.text.trim).toSeq,
        joinOverlapSql = (m \ "joinOverlapSql").map(_.text.trim).toSeq)
    }.toSeq
  }

  /** F11: cluster grouping — drop subsumed mappings (both relation sets
    * contained in another's), seeded shuffle, partition into groups of n
    * with merged relation sets (ref: MappingLoader.py:66-111). The shuffle
    * is the md5 order of (seed, cluster id) — oracle-replayable (q131),
    * unlike JVM `Random.shuffle`.
    */
  def groupClusters(clusters: Seq[MappingCluster], groupSize: Int, seed: Long): Seq[MappingCluster] = {
    val kept = clusters.filterNot { c =>
      clusters.exists(o => (o ne c) &&
        c.sourceRelations.toSet.subsetOf(o.sourceRelations.toSet) &&
        c.targetRelations.toSet.subsetOf(o.targetRelations.toSet) &&
        (o.sourceRelations.size > c.sourceRelations.size ||
          o.targetRelations.size > c.targetRelations.size))
    }
    val shuffled = kept.sortBy(c => graft.core.Det.md5hex(s"$seed|${c.id}"))
    shuffled.grouped(groupSize).zipWithIndex.map { case (g, i) =>
      MappingCluster(
        id = s"group-$i",
        sourceRelations = g.flatMap(_.sourceRelations).distinct,
        targetRelations = g.flatMap(_.targetRelations).distinct,
        goldSql = g.flatMap(_.goldSql),
        joinOverlapSql = g.flatMap(_.joinOverlapSql))
    }.toSeq
  }

  private def attr(n: Node, name: String): String =
    attrOpt(n, name).getOrElse(sys.error(s"missing @$name on <${n.label}>"))
  private def attrOpt(n: Node, name: String): Option[String] =
    n.attribute(name).map(_.text.trim).filter(_.nonEmpty)
}
