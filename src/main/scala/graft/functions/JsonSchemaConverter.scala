package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.types._

/** JSON-Schema → StructType compiler (SURVEY §2.10): the reference
  * derives NLP result-table schemas from pydantic models' JSON Schema
  * (etl/tasks/nlp_task.py:338-394 convert_pydantic_fields_to_pyarrow);
  * declarative NLP tasks carry a response JSON-Schema that must become
  * the output table's Spark schema. Pure driver-side function.
  *
  * Supported: object/array/string/integer/number/boolean, `$defs` +
  * `$ref` indirection, nullable via type arrays (["string","null"]),
  * enum → string, const-span arrays (the reference's fixed-size
  * list(int32, 2) becomes array<int> — Spark has no fixed-size list;
  * length is enforced in code, SURVEY §1.3).
  */
object JsonSchemaConverter {

  private val mapper = new ObjectMapper()

  def fromJson(schemaJson: String): StructType = {
    val root = mapper.readTree(schemaJson)
    convertObject(root, root)
  }

  private def convertObject(node: JsonNode, root: JsonNode): StructType = {
    val props = node.get("properties")
    if (props == null) return StructType(Nil)
    val fields = props.properties().iterator()
    val out = scala.collection.mutable.ArrayBuffer[StructField]()
    while (fields.hasNext) {
      val e = fields.next()
      out += StructField(e.getKey, convertType(e.getValue, root),
        nullable = true)
    }
    StructType(out.toSeq)
  }

  private def convertType(node: JsonNode, root: JsonNode): DataType = {
    // $ref → resolve through $defs/definitions
    val ref = node.get("$ref")
    if (ref != null) {
      val path = ref.asText().stripPrefix("#/").split("/")
      val target = path.foldLeft(root)((n, p) => n.get(p))
      return convertType(target, root)
    }
    // anyOf nullable unions (pydantic emits `anyOf: [{type: X},
    // {type: "null"}]` for `X | None`): take the first non-null member,
    // mirroring the reference's Union handling (nlp_task.py:370-374
    // "just grab first arg"; everything is nullable at the schema layer)
    val anyOf = node.get("anyOf")
    if (anyOf != null && anyOf.isArray) {
      val members = (0 until anyOf.size()).map(anyOf.get)
      val nonNull = members.find { m =>
        val t = m.get("type")
        t == null || t.asText() != "null"
      }
      return nonNull.map(convertType(_, root)).getOrElse(StringType)
    }
    if (node.has("enum")) return StringType

    val t = node.get("type")
    val typeName: String =
      if (t == null) "object"
      else if (t.isArray) {
        // nullable union like ["string","null"] → the non-null member
        val names = (0 until t.size()).map(t.get(_).asText())
        names.find(_ != "null").getOrElse("string")
      } else t.asText()

    typeName match {
      case "object" => convertObject(node, root)
      case "array" =>
        val items = node.get("items")
        val elem =
          if (items == null) StringType else convertType(items, root)
        ArrayType(elem)
      case "string" => StringType
      case "integer" => IntegerType
      case "number" => DoubleType
      case "boolean" => BooleanType
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }
}
