package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

/** Diagnostic main: structural diff of our scrub output vs the
  * reference's golden rows, per resource type. Not a test — a probe for
  * closing remaining fidelity gaps. `sbt "Test/runMain graft.CompatProbe"`
  */
object CompatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    spark.sparkContext.setLogLevel("ERROR")
    val refData = "/root/reference/tests/data/simple"
    val cb = graft.deid.Codebook.loadOrCreate(refData)
    val mapper = new ObjectMapper()
    mapper.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS,
      true)
    def canon(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.select(to_json(struct(df.columns.map(col): _*),
          Map("ignoreNullFields" -> "true")).as("j"))
        .collect().map { r =>
          val node = mapper.readTree(r.getString(0))
          val s = mapper.writeValueAsString(
            mapper.treeToValue(node, classOf[Object]))
          node.get("id").asText() -> s
        }.toMap
    val types =
      if (args.nonEmpty) args.toSeq
      else Seq("Immunization", "Medication", "Encounter", "Procedure",
        "Specimen", "Device", "Organization", "Location")
    types.foreach { rt =>
      val table = rt.toLowerCase
      val ours = canon(graft.deid.ScrubCompiler.scrub(
        graft.sources.NdjsonSource.readResource(
          spark, s"$refData/input", rt), rt, cb))
      val golden = canon(spark.read.json(
        s"$refData/output/$table/$table.000.ndjson"))
      println(s"TABLE $rt")
      golden.toSeq.sortBy(_._1).foreach { case (id, g) =>
        if (ours.get(id).contains(g)) println(s" SAME ${id.take(12)}")
        else {
          println(s" DIFF ${id.take(12)}")
          println(s"  ours:   ${ours.getOrElse(id, "MISSING")}")
          println(s"  golden: $g")
        }
      }
    }
    spark.stop()
  }
}
