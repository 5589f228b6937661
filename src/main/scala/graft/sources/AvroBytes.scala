package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro OBJECT-CONTAINER ingest without the spark-avro connector (which
  * isn't on this classpath — only the core public Avro Java API is):
  * spec-real container files (magic, schema + codec metadata, deflate-
  * compressed blocks, sync markers) written and read through
  * `org.apache.avro.file`, with READER-SCHEMA RESOLUTION — the part of
  * the Avro spec that matters for a 100 TB lake, where files written
  * under several schema generations must all decode under today's
  * schema (missing fields fill from defaults). q294 drives this per
  * file-group inside `flatMapGroups`, so ingest is embarrassingly
  * parallel and the container bytes never leave the executor.
  */
object AvroBytes {

  private def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** Generation 1: no `tier` field. */
  val WriterV1: Schema = parse(
    """{"type":"record","name":"Doc","fields":[
         {"name":"id","type":"long"},
         {"name":"source","type":"string"},
         {"name":"score","type":"double"}]}""")

  /** Generation 2: `tier` added. */
  val WriterV2: Schema = parse(
    """{"type":"record","name":"Doc","fields":[
         {"name":"id","type":"long"},
         {"name":"source","type":"string"},
         {"name":"score","type":"double"},
         {"name":"tier","type":"string"}]}""")

  /** Today's reader schema: V2 shape with a default, so V1 files resolve
    * (schema evolution — the normative resolution path, not a fallback).
    */
  val Reader: Schema = parse(
    """{"type":"record","name":"Doc","fields":[
         {"name":"id","type":"long"},
         {"name":"source","type":"string"},
         {"name":"score","type":"double"},
         {"name":"tier","type":"string","default":"std"}]}""")

  /** One in-memory container file of (id, source, score[, tier]) rows
    * under the given writer schema, deflate-coded, small sync interval so
    * multi-block containers occur at test scale.
    */
  def encode(schema: Schema,
      rows: Seq[(Long, String, Double, Option[String])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.setSyncInterval(256) // force real block structure, not one blob
    w.create(schema, out)
    try {
      rows.foreach { case (id, source, score, tier) =>
        val r = new GenericData.Record(schema)
        r.put("id", id)
        r.put("source", source)
        r.put("score", score)
        tier.foreach(t => r.put("tier", t))
        w.append(r)
      }
    } finally w.close()
    out.toByteArray
  }

  /** Decode a container under [[Reader]] resolution:
    * (codecName, rows as (id, source, score, tier)).
    */
  def decode(bytes: Array[Byte]): (String, Seq[(Long, String, Double, String)]) = {
    val in = new DataFileStream(new ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord](null, Reader))
    try {
      val rows = Seq.newBuilder[(Long, String, Double, String)]
      while (in.hasNext) {
        val r = in.next()
        rows += ((r.get("id").asInstanceOf[Long],
          r.get("source").toString,
          r.get("score").asInstanceOf[Double],
          r.get("tier").toString))
      }
      (in.getMetaString("avro.codec"), rows.result())
    } finally in.close()
  }
}
