package graft.sources.geojson

import java.io.File
import com.fasterxml.jackson.core.JsonToken
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.geom.GeomCodec
import graft.sources._

/** Streaming GeoJSON FeatureCollection reader (reference read path for the
  * GeoJSON driver — S1/S3, reference src/lib.rs:294-312, 332-485). The
  * parser streams the top-level `features` array and materializes one small
  * tree per feature, so memory is O(feature), not O(file).
  *
  * Property typing follows the §1.4 inference contract: JSON ints →
  * Int/Long by magnitude, floats → Double, nested objects → their JSON
  * text, arrays → typed lists (the reference left list columns
  * `unimplemented!` — src/unprocessed_series.rs:172 — we support them).
  */
class GeoJsonFormat extends FeatureFormat {
  override def extensions: Seq[String] = Seq(".json", ".geojson")

  override def open(path: String, opts: GdalOptions): FeatureIterator = {
    val mapper = new ObjectMapper
    val parser = mapper.getFactory.createParser(new File(path))

    // Advance into the top-level "features" array (or a bare feature array /
    // single Feature object).
    var inFeatures = false
    var t = parser.nextToken()
    if (t == JsonToken.START_ARRAY) inFeatures = true // bare array of features
    else {
      var depth = 0
      while (!inFeatures && t != null) {
        t = parser.nextToken()
        t match {
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
          case JsonToken.FIELD_NAME if depth == 0 && parser.currentName == "features" =>
            if (parser.nextToken() == JsonToken.START_ARRAY) inFeatures = true
          case _ => ()
        }
      }
    }

    var idx = -1L
    val it = new Iterator[RawFeature] {
      private var nextNode: ObjectNode = advance()

      private def advance(): ObjectNode =
        if (!inFeatures) null
        else parser.nextToken() match {
          case JsonToken.START_OBJECT => parser.readValueAsTree[ObjectNode]()
          case _ => null // END_ARRAY or EOF
        }

      override def hasNext: Boolean = nextNode != null
      override def next(): RawFeature = {
        val node = nextNode
        nextNode = advance()
        idx += 1
        toFeature(node, idx)
      }
    }
    FeatureIterator(it, () => parser.close())
  }

  private def toFeature(node: ObjectNode, idx: Long): RawFeature = {
    val fid = Option(node.get("id")).filter(_.canConvertToLong).map(_.asLong).getOrElse(idx)
    val geom = Option(node.get("geometry")).filter(!_.isNull)
      .map(g => GeomCodec.toWkb(GeomCodec.fromGeoJsonNode(g))).orNull
    val props = Option(node.get("properties")).filter(_.isObject) match {
      case Some(p) =>
        val it = p.fields()
        val buf = scala.collection.mutable.ArrayBuffer[(String, Any)]()
        while (it.hasNext) {
          val e = it.next()
          buf += e.getKey -> jsonValue(e.getValue)
        }
        buf.toIndexedSeq
      case None => IndexedSeq.empty
    }
    RawFeature(fid, geom, props)
  }

  private def jsonValue(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isIntegralNumber) { if (n.canConvertToInt) n.asInt else n.asLong }
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isTextual) n.asText
    else if (n.isArray) (0 until n.size).map(i => jsonValue(n.get(i)))
    else n.toString // nested object → its JSON text
}
