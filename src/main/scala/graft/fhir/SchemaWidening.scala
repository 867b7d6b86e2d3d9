package graft.fhir

import org.apache.spark.sql.types._

/** "Wide schema, widened by observed rows" (SURVEY §1.2): the reference
  * builds a spec-derived schema then widens it where sample rows nest
  * deeper (cfs.pyarrow_schema_from_rows, etl/tasks/base.py:458-467).
  * Here: merge the catalog StructType with a schema inferred from the
  * actual data — catalog wins on type conflicts (spec is authoritative),
  * observed-only fields are appended, struct/array children merge
  * recursively.
  */
object SchemaWidening {

  def widen(catalog: StructType, observed: StructType): StructType = {
    val catalogNames = catalog.fields.map(_.name).toSet
    val merged = catalog.fields.map { cf =>
      observed.fields.find(_.name == cf.name) match {
        case Some(of) => StructField(cf.name,
          widenType(cf.dataType, of.dataType), nullable = true)
        case None => cf
      }
    }
    val extras = observed.fields.filterNot(f => catalogNames(f.name))
    StructType(merged ++ extras)
  }

  private def widenType(catalog: DataType, observed: DataType): DataType =
    (catalog, observed) match {
      case (c: StructType, o: StructType) => widen(c, o)
      case (ArrayType(c, _), ArrayType(o, _)) =>
        ArrayType(widenType(c, o))
      // shape conflicts (spec says array, export sends a bare object, or
      // vice versa): follow the DATA's shape — the reference's dict walk
      // is shape-agnostic and keeps such fields — while the catalog stays
      // authoritative on the element/leaf types inside
      case (ArrayType(c, _), o) => widenType(c, o)
      case (c, ArrayType(o, _)) => ArrayType(widenType(c, o))
      case (c, _) => c // spec type is authoritative on leaf conflicts
    }
}
