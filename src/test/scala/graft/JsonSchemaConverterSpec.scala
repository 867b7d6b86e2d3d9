package graft

import graft.functions.JsonSchemaConverter
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonSchemaConverterSpec extends AnyFunSuite {

  test("converts an NLP-result-style schema with refs and spans") {
    val schema = JsonSchemaConverter.fromJson(
      """{
        |  "type": "object",
        |  "$defs": {
        |    "Span": {
        |      "type": "array",
        |      "items": {"type": "integer"}
        |    }
        |  },
        |  "properties": {
        |    "note_ref": {"type": "string"},
        |    "has_symptom": {"type": "boolean"},
        |    "confidence": {"type": "number"},
        |    "symptom_count": {"type": "integer"},
        |    "severity": {"enum": ["mild", "moderate", "severe"]},
        |    "comment": {"type": ["string", "null"]},
        |    "spans": {"type": "array", "items": {"$ref": "#/$defs/Span"}},
        |    "details": {
        |      "type": "object",
        |      "properties": {"site": {"type": "string"}}
        |    }
        |  }
        |}""".stripMargin)
    assert(schema("note_ref").dataType === StringType)
    assert(schema("has_symptom").dataType === BooleanType)
    assert(schema("confidence").dataType === DoubleType)
    assert(schema("symptom_count").dataType === IntegerType)
    assert(schema("severity").dataType === StringType)
    assert(schema("comment").dataType === StringType)
    assert(schema("spans").dataType ===
      ArrayType(ArrayType(IntegerType))) // span list shape (SURVEY §1.3)
    assert(schema("details").dataType ===
      StructType(Seq(StructField("site", StringType))))
  }
}
